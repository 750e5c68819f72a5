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


def _ddl_timeline(events: pd.DataFrame):
    """Replay the DDL events: (renames old->new, added cols, dropped cols)."""
    renames: dict[str, str] = {}
    added: list[str] = []
    dropped: set[str] = set()
    ddl = events[events["op"] == "DDL"].sort_values("lsn")
    for _, row in ddl.iterrows():
        d = json.loads(row["payload"])
        if d["action"] == "add_column":
            added.append(d["name"])
            dropped.discard(d["name"])
        elif d["action"] == "rename_column":
            renames[d["old"]] = d["new"]
        elif d["action"] == "drop_column":
            dropped.add(d["name"])
    return renames, added, dropped



def reduce_feed(events: pd.DataFrame) -> pd.DataFrame:
    """events: CHANGE_EVENT_SCHEMA-shaped pandas frame → expected final table."""
    renames, added, dropped = _ddl_timeline(events)

    dml = events[events["op"] != "DDL"].copy()
    dml["_rank"] = dml["op"].map(OP_RANK)
    dml = dml.sort_values(["lsn", "_rank"])  # total order; last row wins
    last = dml.groupby(["conv_id", "turn_idx"], as_index=False).last()
    live = last[last["op"] != "D"].copy()

    cols = [c for c in ([renames.get(c, c) for c in BASE_COLUMNS] + added) if c not in dropped]
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


def reduce_feed_sequential(events: pd.DataFrame) -> pd.DataFrame:
    """Sequential-apply oracle for PARTIAL-row-image feeds: per key, replay
    ops strictly in LSN order exactly as the reference applier executes DML
    (one statement at a time):

    - I: the row becomes the full image (schema columns absent from the
         payload are null);
    - U: only the payload's keys are SET (a present null sets NULL; an
         absent key leaves the column untouched); an U whose key has no
         current row affects 0 rows (no-op);
    - D: the row is removed; later Us on the key are no-ops until a new I.

    DDL timeline applies as in `reduce_feed` (adds null-filled, renames
    metadata-only — old payload keys map to the renamed column, widens
    preserve values). Deliberately per-row Python: this is the slow truth
    the engine's distributed fold is compared against.
    """
    renames, added, dropped = _ddl_timeline(events)
    final_cols = [c for c in ([renames.get(c, c) for c in BASE_COLUMNS] + added) if c not in dropped]

    dml = events[events["op"] != "DDL"].sort_values("lsn")
    state: dict[tuple, dict] = {}
    for _, row in dml.iterrows():
        key = (row["conv_id"], row["turn_idx"])
        op = row["op"]
        if op == "D":
            state.pop(key, None)
            continue
        img = json.loads(row["payload"]) if row["payload"] else {}
        img = {renames.get(k, k): v for k, v in img.items()}
        if op == "I":
            state[key] = {c: img.get(c) for c in final_cols}
        elif op == "U":
            if key in state:
                state[key].update({k: v for k, v in img.items() if k in final_cols})

    out = pd.DataFrame(
        [
            {"conv_id": k[0], "turn_idx": k[1], **v}
            for k, v in state.items()
        ],
        columns=["conv_id", "turn_idx"] + final_cols,
    )
    if "tokens" in out.columns:
        out["tokens"] = out["tokens"].astype("Int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
