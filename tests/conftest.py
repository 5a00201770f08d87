import importlib.util
import os
import shutil
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_tools_package():
    """Load tools/package.py by explicit file path — shared by the
    packaging and ship-path tests so neither mutates sys.path (a path
    insert could shadow an installed edlib_spark/tools for every test
    that runs after it)."""
    spec = importlib.util.spec_from_file_location(
        "edlib_spark_tools_package",
        os.path.join(REPO, "tools", "package.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def spark():
    from edlib_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("edlib-spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_run_dir():
    d = tempfile.mkdtemp(prefix="edlib_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
