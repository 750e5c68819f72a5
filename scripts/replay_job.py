"""CDC replay benchmark worker: one parallelism level per process.

Run via plain `python` or `spark-submit --py-files dist/data_pipeline_spark.zip`
(north rule): replays a pre-generated change feed through the full engine
(streaming source → Arrow decode → salted LWW dedup → COW merge) and prints
one JSON line with throughput. bench.py launches this twice (N and 4N cores)
for the scaling-efficiency evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True)
    ap.add_argument("--events", type=int, required=True)
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-buckets", type=int, default=128)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--decoder", default="pandas", choices=["pandas", "sql"])
    ap.add_argument("--mode", default="stream", choices=["stream", "batch"])
    args = ap.parse_args()

    from data_pipeline_spark.plans.table_format import LakehouseTable
    from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
    from data_pipeline_spark.session import get_spark
    from data_pipeline_spark.streaming.ingest import IngestJob

    spark = get_spark("replay-bench", cores=args.cores)
    root = tempfile.mkdtemp(prefix=f"replay-{args.cores}c-")
    tbl = os.path.join(root, "table")
    LakehouseTable(tbl).create(TRANSCRIPT_SCHEMA, n_buckets=args.n_buckets)
    job = IngestJob(tbl, os.path.join(root, "control"), salt=args.salt, decoder=args.decoder)

    t0 = time.monotonic()
    if args.mode == "stream":
        job.run_to_completion(
            spark, args.feed, os.path.join(root, "ckpt"),
            max_files_per_trigger=args.max_files_per_trigger,
        )
    else:
        job.replay_batch(spark, args.feed, batch_id=0)
    wall = time.monotonic() - t0

    final_rows = LakehouseTable(tbl).read(spark).count()
    print(json.dumps({
        "cores": args.cores,
        "events": args.events,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(args.events / wall, 1),
        "final_rows": final_rows,
        "mode": args.mode,
        "decoder": args.decoder,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
