"""FIXTURES.md §A2 delivery variants + hypothesis property tests.

- re-chunking invariance: same ordered event set, different batch
  boundaries → identical final table
- duplicate-suffix delivery (at-least-once transport) → unchanged state
  (the LSN recovery filter, reference T4)
- random op sequences: engine == oracle reducer
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas
from data_pipeline_spark.streaming.ingest import IngestJob

SPEC = FeedSpec(n_events=6_000, n_convs=150, seed=42)


def _apply_chunks(spark, tmp_path, tag, chunks):
    tbl = str(tmp_path / f"t-{tag}")
    LakehouseTable(tbl).create(TRANSCRIPT_SCHEMA, n_buckets=8)
    job = IngestJob(tbl, str(tmp_path / f"ctl-{tag}"))
    for i, pdf in enumerate(chunks):
        sdf = spark.createDataFrame(pdf, schema=CHANGE_EVENT_SCHEMA)
        job.apply_batch(spark, i, sdf)
    return (
        LakehouseTable(tbl)
        .read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _split(df: pd.DataFrame, sizes: list[int]) -> list[pd.DataFrame]:
    out, i = [], 0
    for s in sizes:
        out.append(df.iloc[i : i + s])
        i += s
    if i < len(df):
        out.append(df.iloc[i:])
    return out


def test_rechunking_invariance(spark, tmp_path):
    feed = generate_feed_pandas(SPEC)
    a = _apply_chunks(spark, tmp_path, "a", _split(feed, [2000, 2000, 2000]))
    b = _apply_chunks(spark, tmp_path, "b", _split(feed, [500, 3500, 1000, 1000]))
    c = _apply_chunks(spark, tmp_path, "c", [feed])
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_duplicate_suffix_delivery(spark, tmp_path):
    feed = generate_feed_pandas(SPEC)
    chunks = _split(feed, [2000, 2000, 2000])
    # at-least-once: the transport re-delivers the last two chunks
    redelivered = chunks + [chunks[1], chunks[2]]
    a = _apply_chunks(spark, tmp_path, "dup", redelivered)
    expected = reduce_feed(feed)
    assert a["text"].tolist() == expected["text"].tolist()
    assert len(a) == len(expected)


@pytest.mark.slow
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # conv
            st.integers(min_value=0, max_value=3),  # turn
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1,
        max_size=60,
    ),
    boundary=st.integers(min_value=1, max_value=59),
)
def test_random_sequences_match_oracle(spark, tmp_path_factory, ops, boundary):
    rows = []
    for i, (c, t, op) in enumerate(ops):
        lsn = i + 1
        conv = f"conv-{c:06d}"
        payload = (
            None
            if op == "D"
            else f'{{"role":"user","text":"turn {t} of {conv} rev {lsn}","ts":"2026-01-01T00:00:00"}}'
        )
        rows.append((lsn, op, pd.Timestamp("2026-01-01"), conv, t, payload))
    feed = pd.DataFrame(
        rows, columns=["lsn", "op", "ts", "conv_id", "turn_idx", "payload"]
    ).astype({"turn_idx": "Int32"})
    tmp = tmp_path_factory.mktemp("prop")
    actual = _apply_chunks(spark, tmp, "p", _split(feed, [min(boundary, len(feed))]))
    expected = reduce_feed(feed)
    assert actual["text"].tolist() == expected["text"].tolist()
    assert actual["conv_id"].tolist() == expected["conv_id"].tolist()


@pytest.mark.slow
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),            # conv
            st.integers(min_value=0, max_value=2),            # turn
            st.sampled_from(["I", "U", "U", "D"]),            # U-heavy mix
            st.integers(min_value=0, max_value=15),           # U column subset draw
        ),
        min_size=1,
        max_size=60,
    ),
    boundary=st.integers(min_value=1, max_value=59),
)
def test_random_partial_sequences_match_sequential_oracle(
    spark, tmp_path_factory, ops, boundary
):
    """Partial-image property: arbitrary op soups (orphan updates, explicit
    nulls, stacked partial updates, delete/revive chains) split at an
    arbitrary chunk boundary equal the per-row sequential oracle."""
    import json as _json

    from data_pipeline_spark.oracle import reduce_feed_sequential

    rows = []
    for i, (c, t, op, sub) in enumerate(ops):
        lsn = i + 1
        conv = f"conv-{c:06d}"
        if op == "D":
            payload = None
        elif op == "I":
            payload = _json.dumps(
                {"role": "user", "text": f"t{t} {conv} r{lsn}", "ts": "2026-01-01T00:00:00"}
            )
        else:  # partial U: column subset from the 4-bit draw; empty -> text
            img = {}
            if sub & 1:
                img["text"] = f"u{lsn}"
            if sub & 2:
                img["role"] = "assistant"
            if sub & 4:
                img["tool"] = None  # explicit SET NULL
            if sub & 8:
                img["ts"] = "2026-01-02T00:00:00"
            if not img:
                img["text"] = f"u{lsn}"
            payload = _json.dumps(img)
        rows.append((lsn, op, pd.Timestamp("2026-01-01"), conv, t, payload))
    feed = pd.DataFrame(
        rows, columns=["lsn", "op", "ts", "conv_id", "turn_idx", "payload"]
    ).astype({"turn_idx": "Int32"})

    tmp = tmp_path_factory.mktemp("pprop")
    table_path = str(tmp / "t")
    LakehouseTable(table_path).create(TRANSCRIPT_SCHEMA, n_buckets=4, update_mode="partial")
    job = IngestJob(table_path, str(tmp / "ctl"))
    for bid, chunk in enumerate(_split(feed, [min(boundary, len(feed))])):
        job.apply_batch(
            spark, bid, spark.createDataFrame(chunk, schema=CHANGE_EVENT_SCHEMA)
        )
    actual = (
        LakehouseTable(table_path).read(spark).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    expected = reduce_feed_sequential(feed)
    assert actual["conv_id"].tolist() == expected["conv_id"].tolist()
    assert actual["text"].tolist() == expected["text"].tolist()
    exp_tool = [None if pd.isna(x) else x for x in expected["tool"]]
    assert actual["tool"].tolist() == exp_tool


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # conv index
            st.integers(min_value=0, max_value=2),   # turn index
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_agg_collapse_equals_window_on_random_sequences(spark, ops):
    """Property: the hash-aggregation LWW collapse (`lww_collapse_agg`, the
    ingest default) picks the SAME winner per key as the window formulation
    for every op sequence — including same-LSN would-be ties broken by
    op_rank (D > U > I)."""
    import json as _json

    from data_pipeline_spark.functions.decode import decode_events
    from data_pipeline_spark.operators.lww import lww_collapse_agg, lww_dedup

    rows = []
    for lsn, (ci, ti, op) in enumerate(ops, start=1):
        payload = (
            None
            if op == "D"
            else _json.dumps({"role": "user", "text": f"t{lsn}", "ts": "2026-01-01T00:00:00"})
        )
        rows.append((lsn, op, None, f"c{ci}", ti, payload))
    raw = spark.createDataFrame(
        rows,
        "lsn long, op string, ts timestamp, conv_id string, turn_idx int, payload string",
    )
    decoded = decode_events(raw, TRANSCRIPT_SCHEMA)
    w = lww_dedup(decoded).orderBy("conv_id", "turn_idx").toPandas()
    a = (
        lww_collapse_agg(decoded)
        .select(*w.columns)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(w, a)
