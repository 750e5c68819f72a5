"""Reference reducer: the expected-output spec (FIXTURES.md §A4).

Pure pandas, deliberately simple and slow — the single source of truth the
engine's distributed output is compared against, byte-for-byte on `text`
under stable (conv_id, turn_idx) ordering (BASELINE.json invariant).

Semantics (SURVEY.md §2.3): for each key, the visible row after replay is the
row image of that key's max-LSN op (ties broken by op rank D>U>I); absent if
that op is a DELETE. DDL applies to all subsequent events: columns added
later are null for rows last written before the DDL; renames preserve data;
widens preserve values.
"""

from __future__ import annotations

import json

import pandas as pd

from data_pipeline_spark.schemas import OP_RANK

BASE_COLUMNS = ["role", "text", "tool", "ts"]


def reduce_feed(events: pd.DataFrame) -> pd.DataFrame:
    """events: CHANGE_EVENT_SCHEMA-shaped pandas frame → expected final table."""
    ddl = events[events["op"] == "DDL"].sort_values("lsn")
    renames: dict[str, str] = {}
    added: list[str] = []
    for _, row in ddl.iterrows():
        d = json.loads(row["payload"])
        if d["action"] == "add_column":
            added.append(d["name"])
        elif d["action"] == "rename_column":
            renames[d["old"]] = d["new"]

    dml = events[events["op"] != "DDL"].copy()
    dml["_rank"] = dml["op"].map(OP_RANK)
    dml = dml.sort_values(["lsn", "_rank"])  # total order; last row wins
    last = dml.groupby(["conv_id", "turn_idx"], as_index=False).last()
    live = last[last["op"] != "D"].copy()

    cols = [renames.get(c, c) for c in BASE_COLUMNS] + added
    parsed = pd.DataFrame(
        [json.loads(p) if p else {} for p in live["payload"]], index=live.index
    )
    out = live[["conv_id", "turn_idx"]].copy()
    for c in cols:
        # a column may appear under its old (pre-rename) name in old payloads
        old_names = [o for o, n in renames.items() if n == c]
        src = parsed[c] if c in parsed else pd.Series(None, index=live.index)
        for o in old_names:
            if o in parsed:
                src = src.combine_first(parsed[o])
        out[c] = src
    if "tokens" in out.columns:
        out["tokens"] = out["tokens"].astype("Int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
