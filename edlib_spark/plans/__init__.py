from .catalog import RunCatalog  # noqa: F401
from .linkage import run_linkage, LinkageConfig, pairwise_f1  # noqa: F401
