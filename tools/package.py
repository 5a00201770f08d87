"""Build ship artifacts: dist/edlib_spark.zip (``spark-submit
--py-files``) and a PEP-427 wheel (``pip install`` on cluster images).

Both are deterministic (sorted entries, zeroed timestamps) so reship
diffs are meaningful.  The wheel is assembled directly (purelib,
py3-none-any) rather than through a build backend because this sandbox
has no ``wheel`` package; real environments can equivalently run
``pip wheel .`` against pyproject.toml, which declares the same
metadata.

Usage: python tools/package.py [out_zip]
       python tools/package.py --wheel [out_dir]
"""

from __future__ import annotations

import base64
import hashlib
import os
import re
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_version() -> str:
    """Single source of truth is edlib_spark/__init__.py (parsed, not
    imported, so building artifacts needs no package imports);
    pyproject.toml reads the same attribute via setuptools dynamic
    versioning."""
    init = os.path.join(REPO, "edlib_spark", "__init__.py")
    with open(init, encoding="utf-8") as fh:
        return re.search(r'__version__ = "([^"]+)"', fh.read()).group(1)


VERSION = _read_version()


def _pkg_entries() -> list[tuple[str, bytes]]:
    """The one source listing both artifacts ship: every .py under
    edlib_spark/, sorted by archive path.  Zip and wheel MUST stay
    content-identical — if the inclusion rule changes, it changes here
    for both."""
    pkg = os.path.join(REPO, "edlib_spark")
    out = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                with open(full, "rb") as fh:
                    out.append((os.path.relpath(full, REPO), fh.read()))
    return sorted(out)


def build(out_zip: str | None = None) -> str:
    out = out_zip or os.path.join(REPO, "dist", "edlib_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in _pkg_entries():
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out


def build_wheel(out_dir: str | None = None) -> str:
    """Assemble edlib_spark-{VERSION}-py3-none-any.whl: package sources
    plus dist-info (METADATA / WHEEL / RECORD with sha256 digests),
    installable with ``pip install --no-index`` on an offline image."""
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    name = f"edlib_spark-{VERSION}-py3-none-any.whl"
    info = f"edlib_spark-{VERSION}.dist-info"
    entries = _pkg_entries()
    entries.append((f"{info}/METADATA", (
        "Metadata-Version: 2.1\n"
        "Name: edlib-spark\n"
        f"Version: {VERSION}\n"
        "Summary: PySpark-native record-linkage engine with edlib's "
        "alignment semantics\n"
        "Requires-Python: >=3.10\n"
        "Requires-Dist: numpy>=1.24\n"
        "Provides-Extra: spark\n"
        'Requires-Dist: pyspark>=3.5; extra == "spark"\n'
        'Requires-Dist: pandas>=2.0; extra == "spark"\n'
        'Requires-Dist: pyarrow>=12; extra == "spark"\n').encode()))
    entries.append((f"{info}/WHEEL", (
        "Wheel-Version: 1.0\n"
        "Generator: edlib-spark-tools\n"
        "Root-Is-Purelib: true\n"
        "Tag: py3-none-any\n").encode()))
    record = "".join(
        f"{arc},sha256={base64.urlsafe_b64encode(hashlib.sha256(data).digest()).rstrip(b'=').decode()},{len(data)}\n"
        for arc, data in entries) + f"{info}/RECORD,,\n"
    entries.append((f"{info}/RECORD", record.encode()))
    path = os.path.join(out_dir, name)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in entries:
            zi = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return path


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--wheel":
        print(build_wheel(sys.argv[2] if len(sys.argv) > 2 else None))
    else:
        print(build(sys.argv[1] if len(sys.argv) > 1 else None))
