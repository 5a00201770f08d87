"""edlib-spark: PySpark-native record-linkage engine with edlib's
alignment semantics (see README.md / SURVEY.md).

Public surface:
  * kernel.align            — exact single-pair aligner (reference-parity)
  * batch.batch_edit_distance — vectorized distance hot path
  * functions.alignment     — Column API (edit_distance, align_expr, ...)
  * plans.linkage.run_linkage — the end-to-end pipeline
"""

from .batch import batch_edit_distance
from .functions.alignment import (align_expr, edit_distance,
                                  nice_alignment, norm_distance)
from .kernel import align

__version__ = "0.4.0"

__all__ = [
    "align",
    "align_expr",
    "batch_edit_distance",
    "edit_distance",
    "nice_alignment",
    "norm_distance",
    "__version__",
]
