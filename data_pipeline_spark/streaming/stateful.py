"""Custom stateful streaming operator: per-conversation running activity.

The engine's core apply path deliberately keeps NO stream state (all state
lives in the table + control table — restart-friendly, SURVEY.md §2.2). This
module is the complementary pattern for consumers that need live per-key
rollups over the change feed: a pandas-native stateful operator
(`applyInPandasWithState`) maintaining per-conv_id counters across
micro-batches, checkpoint-recoverable like any Structured Streaming state.

Reference analog: none — iagcl/data_pipeline has no streaming aggregation
surface at all; its audit rows (process_control_detail) are the closest
concept, per batch not per key. This operator is the per-key live version.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "conv_id string, events bigint, deletes bigint, max_lsn bigint, n_turns int"
STATE_SCHEMA = "events bigint, deletes bigint, max_lsn bigint, turns_csv string"


def conv_activity_stream(stream: DataFrame) -> DataFrame:
    """Running per-conversation rollup over the change feed: total events,
    deletes, max LSN, and distinct turns touched — emitted in `update` mode
    every micro-batch, state carried in the checkpoint.

    Distinct-turn tracking keeps the state bounded (turn_idx < max_turns);
    an unbounded-cardinality set would belong in the table, not in stream
    state."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        events, deletes, max_lsn, turns_csv = 0, 0, 0, ""
        if state.exists:
            events, deletes, max_lsn, turns_csv = state.get
        turns = set(int(t) for t in turns_csv.split(",") if t != "")
        for pdf in pdfs:
            events += len(pdf)
            deletes += int((pdf["op"] == "D").sum())
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            turns.update(int(t) for t in pdf["turn_idx"].dropna())
        state.update((events, deletes, max_lsn, ",".join(str(t) for t in sorted(turns))))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "events": [events],
                "deletes": [deletes],
                "max_lsn": [max_lsn],
                "n_turns": [len(turns)],
            }
        )

    dml = stream.where(stream["op"] != "DDL")
    return dml.groupBy("conv_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
