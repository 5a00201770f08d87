"""The ``spark-submit --py-files`` ship path: build dist/edlib_spark.zip
and prove the package imports AND computes from the zip alone.

This is how executors receive the engine on a real cluster (the north
rule's ship criterion): the zip goes on every executor's sys.path, so
every module must be importable without the repo checkout present.  The
test runs a subprocess whose cwd and sys.path contain ONLY the zip (no
/root/repo), imports the kernel and the batch path through zipimport,
and checks a known alignment — including the batch kernel, whose
optional cffi build writes to ~/.cache (never into the package dir, so
it is zip-safe) and falls back to numpy when no compiler exists.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.package import build  # noqa: E402

_PROBE = r"""
import sys
zip_path = sys.argv[1]
# only the zip (plus stdlib/site-packages for numpy) — no repo checkout
sys.path.insert(0, zip_path)
import edlib_spark
assert zip_path in edlib_spark.__file__, edlib_spark.__file__

from edlib_spark.kernel import align
r = align("telephone", "elephant", mode="NW", task="path")
assert r["editDistance"] == 3, r
assert r["cigar"] == "1I5=1X1=1X", r

from edlib_spark.batch import batch_edit_distance
d = batch_edit_distance(["kitten", "abc", ""], ["sitting", "abc", "xy"])
assert list(d) == [3, 0, 2], d

from edlib_spark.oracle import simple_edit_distance
assert simple_edit_distance("kitten", "sitting", mode="NW")[0] == 3
print("ZIP_OK")
"""


def test_zip_imports_and_computes(tmp_path):
    out = build(str(tmp_path / "edlib_spark.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE, out],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ZIP_OK" in proc.stdout


def test_zip_is_reproducible(tmp_path):
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
