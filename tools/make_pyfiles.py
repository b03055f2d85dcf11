"""Build the --py-files artifact for spark-submit deployment
(north_rule: "run via spark-submit --py-files on a multi-executor
cluster").

    python tools/make_pyfiles.py          -> dist/motive_rdf_spark.zip

The zip contains the package only (no tests/tools); executors unpack
it onto their PYTHONPATH, so every pandas UDF's module-level imports
resolve cluster-side. Driver scripts (e.g. jobs/construct_job.py) ship
separately as the spark-submit primary file.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "motive_rdf_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "motive_rdf_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
