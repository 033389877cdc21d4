"""Package gunrock_spark for spark-submit --py-files.

Builds dist/gunrock_spark.zip with the package at the archive root so
executors can `import gunrock_spark` straight off the distributed zip
(the north rule's deployment mode: spark-submit --py-files on a
multi-executor cluster).

  python scripts/make_pyfiles.py
  spark-submit --py-files dist/gunrock_spark.zip jobs/pagerank.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "gunrock_spark.zip")
    pkg = os.path.join(REPO, "gunrock_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if name.endswith(".pyc"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    print(out)
    return out


if __name__ == "__main__":
    main()
