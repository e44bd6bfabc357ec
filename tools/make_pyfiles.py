"""Build the --py-files artifact for spark-submit (north rule execution
mode): zips the package into dist/obie_spark.zip so every executor and the
driver import the identical code.

    python tools/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "obiemachinelearningframework_spark"


def build(out: str | None = None) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out or os.path.join(root, "dist", "obie_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    src = os.path.join(root, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(src):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
