"""Package the engine for spark-submit --py-files (north-rule deploy shape).

Produces dist/data_pipeline_spark.zip; run a replay on a cluster with:

    spark-submit --master <cluster> --py-files dist/data_pipeline_spark.zip \
        scripts/replay_job.py --feed <dir> --events <n> --cores <per-exec>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "data_pipeline_spark.zip")
    pkg = os.path.join(REPO, "data_pipeline_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
