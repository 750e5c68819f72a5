"""GC concurrent with ingest: `expire_snapshots(orphan_grace_seconds=...)`
must be safe to run while merges are landing — an in-flight writer's files
(data under .tmp-*, a renamed-but-uncommitted s<id> dir, a manifest written
before its snapshot json) are all unreferenced for an instant, and the
grace is what keeps a concurrent GC from destroying the commit. This is
the live-race proof behind the planted-file tests in test_orphan_grace.py:
an aggressive expire loop (keep_last=2, grace 600s) hammers the table while
8 batches land; every batch must survive, the final state must equal the
oracle, and the CURRENT snapshot must stay fully readable throughout."""

from __future__ import annotations

import threading

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable, with_commit_retry
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob


def test_expire_with_grace_races_ingest_without_losing_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    tbl = LakehouseTable(path)

    feed = generate_feed_pandas(FeedSpec(n_events=12_000, n_convs=80, seed=83))
    chunks = [feed.iloc[i * 1_500 : (i + 1) * 1_500] for i in range(8)]

    errors: list[BaseException] = []

    def ingest_all() -> None:
        try:
            for b, chunk in enumerate(chunks):
                df = spark.createDataFrame(chunk, schema=CHANGE_EVENT_SCHEMA)
                with_commit_retry(lambda: job.apply_batch(spark, b, df))
        except BaseException as e:  # surface to the main thread
            errors.append(e)

    t = threading.Thread(target=ingest_all)
    t.start()
    expirations = 0
    while t.is_alive():
        # aggressive retention + a generous grace: everything the expire
        # sees as "unreferenced" during the race is seconds old, so the
        # grace must spare it all — metadata AND data
        tbl.expire_snapshots(keep_last=2, orphan_grace_seconds=600)
        expirations += 1
    t.join()
    assert not errors, errors
    assert expirations > 0

    expected = reduce_feed(feed)
    actual = (
        tbl.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert actual["text"].tolist() == expected["text"].tolist()
    # every batch committed exactly once despite GC running throughout
    merge_batches = [
        s.get("batch_id") for s in tbl.history() if s["kind"] == "merge"
    ]
    assert sorted(b for b in merge_batches if b is not None) == list(range(8))
    # and a duplicate replay of the last batch is still a skip (control
    # records survived the GC)
    df = spark.createDataFrame(chunks[-1], schema=CHANGE_EVENT_SCHEMA)
    assert job.apply_batch(spark, 7, df).get("skipped")
