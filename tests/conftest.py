import os
import shutil
import tempfile

import pytest


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
