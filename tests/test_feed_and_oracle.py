"""Generator determinism + oracle reducer sanity (pure pandas, no Spark)."""

from __future__ import annotations

import json

import pandas as pd

from data_pipeline_spark.oracle import reduce_feed
from data_pipeline_spark.sources.feed import FeedSpec, generate_feed_pandas


def test_generator_deterministic():
    a = generate_feed_pandas(FeedSpec(n_events=5_000, n_convs=100, seed=42))
    b = generate_feed_pandas(FeedSpec(n_events=5_000, n_convs=100, seed=42))
    pd.testing.assert_frame_equal(a, b)
    c = generate_feed_pandas(FeedSpec(n_events=5_000, n_convs=100, seed=7))
    assert not a["conv_id"].equals(c["conv_id"])


def test_generator_shape_and_rules():
    spec = FeedSpec(n_events=10_000, n_convs=200, seed=42)
    df = generate_feed_pandas(spec)
    assert list(df.columns) == ["lsn", "op", "ts", "conv_id", "turn_idx", "payload"]
    assert df["lsn"].is_monotonic_increasing and df["lsn"].is_unique
    # first op per key is an INSERT
    firsts = df.groupby(["conv_id", "turn_idx"], dropna=True).first()
    assert (firsts["op"] == "I").all()
    # payloads parse and carry the invariant text
    sample = df[df["op"].isin(["I", "U"])].head(50)
    for _, r in sample.iterrows():
        p = json.loads(r["payload"])
        assert p["text"] == f"turn {r['turn_idx']} of {r['conv_id']} rev {r['lsn']}"
    # deletes carry no payload
    assert df.loc[df["op"] == "D", "payload"].isna().all()


def test_hot_key_skew():
    spec = FeedSpec(n_events=20_000, n_convs=500, seed=42, hot_key=True)
    df = generate_feed_pandas(spec)
    share = (df["conv_id"] == "conv-000500").mean()
    assert 0.28 < share < 0.33


def test_oracle_lww_semantics():
    events = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4, 5, 6],
            "op": ["I", "U", "I", "D", "I", "U"],
            "ts": pd.to_datetime(["2026-01-01"] * 6),
            "conv_id": ["a", "a", "b", "b", "c", "c"],
            "turn_idx": pd.array([0, 0, 0, 0, 1, 1], dtype="Int32"),
            "payload": [
                '{"role":"user","text":"a0 v1","ts":"2026-01-01T00:00:00"}',
                '{"role":"user","text":"a0 v2","ts":"2026-01-01T00:00:00"}',
                '{"role":"user","text":"b0 v1","ts":"2026-01-01T00:00:00"}',
                None,
                '{"role":"tool","text":"c1 v1","tool":"search","ts":"2026-01-01T00:00:00"}',
                '{"role":"tool","text":"c1 v2","tool":"python","ts":"2026-01-01T00:00:00"}',
            ],
        }
    )
    out = reduce_feed(events)
    assert len(out) == 2  # key b/0 deleted
    assert out.loc[0, "text"] == "a0 v2"  # update wins
    assert out.loc[1, "text"] == "c1 v2" and out.loc[1, "tool"] == "python"


def test_oracle_ddl_timeline():
    spec = FeedSpec(n_events=8_000, n_convs=150, seed=42, with_ddl=True)
    df = generate_feed_pandas(spec)
    assert (df["op"] == "DDL").sum() == 3
    out = reduce_feed(df)
    assert "tokens" in out.columns and "tool_name" in out.columns and "tool" not in out.columns
    # rows last written before the add_column DDL show null tokens
    add_lsn = [l for l, d in spec.ddl_lsns.items() if d["action"] == "add_column"][0]
    dml = df[df["op"] != "DDL"]
    last = dml.sort_values("lsn").groupby(["conv_id", "turn_idx"]).last()
    live = last[last["op"] != "D"].reset_index()
    merged = out.merge(live[["conv_id", "turn_idx", "lsn"]], on=["conv_id", "turn_idx"])
    before = merged[merged["lsn"] < add_lsn]
    after = merged[merged["lsn"] > add_lsn]
    assert before["tokens"].isna().all()
    assert after["tokens"].notna().all()
