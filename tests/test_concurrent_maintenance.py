"""Maintenance concurrent with ingest: compaction and merges are separate
optimistic writers; under `with_commit_retry` both land and the table still
equals the oracle. This is the operational story for 100 TB — a maintenance
scheduler must not need to pause the ingest stream to compact."""

from __future__ import annotations

import threading

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable, with_commit_retry
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob

import pandas as pd


def test_compaction_races_ingest_without_losing_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # manual compaction only: the race under test is an EXTERNAL maintenance
    # writer, not the ingest job's own auto-compact
    LakehouseTable(path).create(TRANSCRIPT_SCHEMA, n_buckets=4, compact_every=10**9)
    job = IngestJob(path, str(tmp_path / "ctl"))
    tbl = LakehouseTable(path)

    feed = generate_feed_pandas(FeedSpec(n_events=12_000, n_convs=80, seed=81))
    chunks = [feed.iloc[i * 1_500 : (i + 1) * 1_500] for i in range(8)]

    errors: list[BaseException] = []
    compactions: list[dict] = []

    def ingest_all() -> None:
        try:
            for b, chunk in enumerate(chunks):
                df = spark.createDataFrame(chunk, schema=CHANGE_EVENT_SCHEMA)
                with_commit_retry(lambda: job.apply_batch(spark, b, df))
        except BaseException as e:  # surface to the main thread
            errors.append(e)

    t = threading.Thread(target=ingest_all)
    t.start()
    # fire compactions while batches are landing; each reloads state itself.
    # An attempt can exhaust its retries if merges land faster than the
    # compaction rewrites — optimistic maintenance loses to a hot ingest
    # stream sometimes (Iceberg's RewriteFiles does too); what must NEVER
    # happen is a landed compaction orphaning a landed merge.
    from data_pipeline_spark.plans.table_format import CommitConflictError

    while t.is_alive():
        try:
            out = with_commit_retry(lambda: tbl.compact(spark))
        except CommitConflictError:
            continue
        if not out.get("skipped"):
            compactions.append(out)
    t.join()
    assert not errors, errors
    # a final sweep so the assertion below isn't vacuous
    out = with_commit_retry(lambda: tbl.compact(spark))
    if not out.get("skipped"):
        compactions.append(out)
    assert compactions, "no compaction ever landed during the run"

    expected = reduce_feed(feed)
    actual = (
        tbl.read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert actual["text"].tolist() == expected["text"].tolist()
    # every batch committed exactly once despite the contention
    kinds = [(s["kind"], s.get("batch_id")) for s in tbl.history()]
    merge_batches = [b for k, b in kinds if k == "merge"]
    assert sorted(merge_batches) == list(range(8))
