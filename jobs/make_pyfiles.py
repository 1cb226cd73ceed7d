"""Build the ``--py-files`` zip for cluster submission.

    python jobs/make_pyfiles.py [dist/ocrd_odem_spark.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(target: str | None = None) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = target or os.path.join(root, "dist", "ocrd_odem_spark.zip")
    os.makedirs(os.path.dirname(target), exist_ok=True)
    pkg = os.path.join(root, "ocrd_odem_spark")
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, root))
    return target


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
