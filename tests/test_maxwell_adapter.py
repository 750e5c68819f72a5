"""Maxwell adapter (sources/maxwell.py): the MySQL CDC JSON wire → canonical
envelope. The binlog-position lsn encoding is order-preserving (not value-
identical to the native feed's lsn — LWW correctness needs order only), so
equality is asserted at the decoded-column and final-table level."""

from __future__ import annotations

import pandas as pd

from data_pipeline_spark.functions.decode import decode_events
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed, read_feed_batch
from data_pipeline_spark.sources.maxwell import (
    read_maxwell_batch,
    read_maxwell_stream,
    write_maxwell_feed,
)
from data_pipeline_spark.streaming.ingest import IngestJob


def test_envelope_order_and_decode_match_native(spark, tmp_path):
    spec = FeedSpec(n_events=4_000, n_convs=100, seed=33, chunk_size=1_000)
    native, mxw = str(tmp_path / "n"), str(tmp_path / "m")
    generate_feed(native, spec)
    write_maxwell_feed(mxw, spec)

    nat = read_feed_batch(spark, native).orderBy("lsn").toPandas()
    got = read_maxwell_batch(spark, mxw).orderBy("lsn").toPandas()
    # lsn: order-preserving binlog-position composite, strictly increasing
    assert got["lsn"].is_monotonic_increasing and got["lsn"].is_unique
    for c in ("op", "ts", "conv_id", "turn_idx"):
        pd.testing.assert_series_equal(nat[c], got[c], check_dtype=False)

    # decoded row images identical (lsn column excluded by design)
    a = decode_events(read_feed_batch(spark, native), TRANSCRIPT_SCHEMA)
    b = decode_events(read_maxwell_batch(spark, mxw), TRANSCRIPT_SCHEMA)
    cols = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pd.testing.assert_frame_equal(
        a.orderBy("lsn").toPandas()[cols], b.orderBy("lsn").toPandas()[cols],
        check_dtype=False,
    )


def test_streaming_ingest_with_ddl_equals_native(spark, tmp_path):
    """Full streaming replay off the Maxwell directory — DDL arriving as
    type=table-alter SQL records — lands the same visible table as the
    native feed (hidden _lsn differs by the position encoding)."""
    spec = FeedSpec(n_events=6_000, n_convs=150, seed=35, chunk_size=1_500,
                    with_ddl=True)
    native, mxw = str(tmp_path / "n"), str(tmp_path / "m")
    generate_feed(native, spec)
    write_maxwell_feed(mxw, spec)

    t_nat = str(tmp_path / "tn")
    LakehouseTable(t_nat).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    IngestJob(t_nat, str(tmp_path / "cn")).run_to_completion(
        spark, native, str(tmp_path / "kn"), max_files_per_trigger=2
    )

    t_mxw = str(tmp_path / "tm")
    LakehouseTable(t_mxw).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = IngestJob(
        t_mxw, str(tmp_path / "cm"),
        stream_reader=read_maxwell_stream, batch_reader=read_maxwell_batch,
    )
    job.run_to_completion(spark, mxw, str(tmp_path / "km"), max_files_per_trigger=2)

    a = (LakehouseTable(t_nat).read(spark).toPandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (LakehouseTable(t_mxw).read(spark).toPandas()
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    names = [f.name for f in LakehouseTable(t_mxw).schema_struct().fields]
    assert "tool_name" in names and "tokens" in names and "tool" not in names
