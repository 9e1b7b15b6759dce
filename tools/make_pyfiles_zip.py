"""Package jvector_spark into dist/jvector_spark.zip for
``spark-submit --py-files dist/jvector_spark.zip`` (the cluster deployment
unit named by the north rule). Pure stdlib; deterministic file order."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "jvector_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pkg = os.path.join(REPO, "jvector_spark")
    files = []
    for root, _dirs, names in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for n in sorted(names):
            if n.endswith(".py"):
                full = os.path.join(root, n)
                files.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in sorted(files, key=lambda t: t[1]):
            z.write(full, rel)
    print(OUT, len(files), "files")


if __name__ == "__main__":
    main()
