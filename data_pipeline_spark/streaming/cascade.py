"""Live table→table replication chaining (the K1 producer loop, closed).

The reference topology publishes an applied table's changes back onto the
bus so further targets consume them like any source feed (extract → Kafka →
apply → Kafka → apply...; SURVEY.md §2 K1/S4). Here the hop is one
Structured Streaming job per edge:

    upstream.stream_changes  →  changes_to_feed  →  downstream apply_batch

- Transport: in-lake (the downstream job tails the upstream DELTA layer
  directly — no broker needed; swap `write_kafka_feed_stream` /
  `read_kafka_feed_stream` in for a real bus hop, same envelope).
- Delivery: the upstream stream is at-least-once (delta files are visible
  before their commit swings) and UNORDERED across catch-up micro-batches
  (the file source batches by mtime, not commit order), so the edge applies
  with the LSN watermark filter OFF; the downstream sink is the engine's
  own idempotent merge — LWW keyed by (conv_id, turn_idx, lsn) places rows
  correctly whatever the arrival order and makes re-emitted rows no-ops,
  and checkpoint re-delivery of a whole micro-batch is skipped by batch_id.
  Net effect: exactly-once table state.
- Chains compose: B can itself cascade to C (each edge has its own
  checkpoint + control table), which is how fan-out replication trees are
  built without re-reading A.

Scale notes (100 TB): each micro-batch moves only the upstream COMMIT DELTA
(collapsed changesets), never the table; the downstream apply is the same
decode→collapse→bucketed-merge plan as first-hop ingest — two shuffles per
batch, O(batch) commit metadata. The JSON re-encode hop costs one Catalyst
`to_json` projection per batch; an in-lake-only deployment could skip the
envelope and feed the changelog columns straight to the collapse, but the
envelope keeps every edge bus-compatible, which is the reference contract.

DML only: schema changes do NOT flow through the changelog (the reference
routes DDL on the bus; the in-lake delta files carry data rows only). Apply
upstream DDL to the downstream table out-of-band (`apply_ddl` with the same
descriptors) and restart the cascade — `stream_changes`' fixed output
schema needs the restart anyway. `sync_schema()` does the descriptor-free
equivalent: it verifies name/type alignment and raises on drift, so a
cascade never silently nulls a renamed column.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.sources.kafka import changes_to_feed
from data_pipeline_spark.streaming.ingest import IngestJob


def filter_replica_changes(changes: DataFrame, predicate: Column | str) -> DataFrame:
    """Changelog transform that maintains a PREDICATE-FILTERED replica:
    downstream converges to exactly ``σ_predicate(upstream)``, not to "rows
    that matched when they flowed by".

    Plain row-filtering a changelog is WRONG for replicas: when a key's
    image stops matching (UPDATE moves it outside the predicate), dropping
    that U leaves the stale pre-update row live downstream forever. The
    correct algebra converts it: I/U rows matching the predicate pass;
    I/U rows NOT matching (including null-valued predicates, σ semantics)
    become DELETES downstream; upstream D tombstones always pass (their
    data columns are null — the predicate can't evaluate, and deleting an
    absent key is a no-op). A key that never matched just accrues a
    harmless tombstone.

    Runs on batch or streaming changelog frames, upstream of
    ``changes_to_feed`` (the D-conversion must happen while ``_change_op``
    is still visible)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    keep_op = F.when(
        (F.col("_change_op") == "D") | pred, F.col("_change_op")
    ).otherwise(F.lit("D"))
    return changes.withColumn("_change_op", keep_op)


def _replica_feed(
    changes: DataFrame,
    row_predicate: Column | str | None,
    columns: list[str] | None,
) -> DataFrame:
    """Changelog micro-batch → the (optionally filtered/projected) cascade
    feed for one replica target."""
    if row_predicate is not None:
        changes = filter_replica_changes(changes, row_predicate)
    return changes_to_feed(changes, columns=columns)


def _assert_replica_schema(
    upstream: LakehouseTable, downstream: LakehouseTable, columns: list[str] | None
) -> None:
    """Raise unless the downstream schema equals the upstream one (names and
    types, in order; restricted to keys + `columns` for a projection)."""
    keys = {"conv_id", "turn_idx"}
    up = [
        (f["name"], f["type"])
        for f in upstream._load_schema(upstream.current_snapshot()["schema_id"])[
            "fields"
        ]
        if columns is None or f["name"] in keys or f["name"] in columns
    ]
    down = [
        (f["name"], f["type"])
        for f in downstream._load_schema(
            downstream.current_snapshot()["schema_id"]
        )["fields"]
    ]
    if up != down:
        raise ValueError(
            "cascade schema drift (apply upstream DDL downstream, then "
            f"restart the edge): upstream={up} downstream={down}"
        )


class CascadeJob:
    """One replication edge: tail `upstream`'s changelog live and keep
    `downstream` identical. Construction mirrors IngestJob (the downstream
    half IS an IngestJob over the cascade feed)."""

    def __init__(
        self,
        upstream_path: str,
        downstream_path: str,
        control_path: str,
        row_predicate: Column | str | None = None,
        columns: list[str] | None = None,
        **ingest_kw,
    ):
        """row_predicate: maintain a filtered replica — downstream =
        σ_predicate(upstream), with updates that leave the predicate
        converted to downstream deletes (see `filter_replica_changes`).
        columns: projected replica — downstream carries only the keys plus
        this non-key column subset (the downstream table must be created
        with exactly that schema)."""
        self.row_predicate = row_predicate
        self.columns = columns
        self.upstream = LakehouseTable(upstream_path)
        # ddl_fast_scan would probe the upstream DELTA files for an `op`
        # column they don't have; the cascade feed is DML-only by contract,
        # so the probe is skipped outright via ddl_rows=[] in the handler.
        ingest_kw.setdefault("ddl_fast_scan", False)
        self.job = IngestJob(downstream_path, control_path, **ingest_kw)

    def sync_schema(self) -> None:
        """Assert the downstream schema matches the upstream one (names and
        types, in order; restricted to keys + `columns` for a projected
        replica). Cascades replicate DML only — run this at edge start and
        after any upstream DDL (apply the same DDL descriptors downstream,
        then restart the stream)."""
        _assert_replica_schema(self.upstream, self.job.table, self.columns)

    # ------------------------------------------------------------- streaming
    def start(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
        fail_after_batches: int | None = None,  # test hook: simulate a crash
    ):
        """Start the edge. available_now=True drains the retained upstream
        changelog and stops (catch-up / test mode); False tails live.
        max_files_per_trigger bounds catch-up micro-batches (a fresh
        checkpoint otherwise sees the whole retained delta history at
        once)."""
        self.sync_schema()
        applied = {"n": 0}

        def handle(df: DataFrame, batch_id: int) -> None:
            if fail_after_batches is not None and applied["n"] >= fail_after_batches:
                raise RuntimeError("injected crash (test hook)")
            # enforce_watermark=False: the file source orders catch-up
            # micro-batches by file mtime, NOT by upstream commit order, so a
            # later micro-batch can legitimately carry OLDER lsns (e.g.
            # maxFilesPerTrigger splitting a multi-commit backlog). The
            # downstream watermark filter would drop those rows as replays —
            # data loss. Correctness never depended on it here: read-side
            # LWW keyed by (key, lsn) places every row, old-before-new or
            # not, and checkpoint re-delivery is still skipped by batch_id.
            self.job.apply_batch(
                df.sparkSession,
                int(batch_id),
                _replica_feed(df, self.row_predicate, self.columns),
                enforce_watermark=False,
                ddl_rows=[],
            )
            applied["n"] += 1

        writer = (
            self.upstream.stream_changes(spark, max_files_per_trigger)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, spark: SparkSession, checkpoint_dir: str) -> None:
        q = self.start(spark, checkpoint_dir, available_now=True)
        q.awaitTermination()


@dataclass
class CascadeTarget:
    """One replica in a CascadeFanout: a downstream table plus its optional
    filter/projection (see CascadeJob for the semantics of each)."""

    name: str
    table_path: str
    row_predicate: Column | str | None = None
    columns: list[str] | None = None


class CascadeFanout:
    """N downstream replicas from ONE pass over the upstream changelog.

    Running N independent CascadeJob edges works, but each runs its own
    file stream over A's delta layer — N× read (and decode) amplification
    on the upstream storage, the thing a busy hub table can't afford. The
    fan-out reads each micro-batch ONCE, persists it, and submits every
    target's filter→re-encode→apply from a thread pool over the shared
    cached batch (the same cluster-saturating pattern as the multi-table
    router and `initsync_all`; per-target commits are independent — each
    replica has its own table dir + control dir).

    Failure semantics: any target's failure fails the micro-batch; on
    resume the checkpoint re-delivers it and targets that already committed
    skip by batch_id — per-replica exactly-once, no partial-batch holes."""

    def __init__(
        self,
        upstream_path: str,
        targets: list[CascadeTarget],
        control_root: str,
        apply_concurrency: int = 8,
        **ingest_kw,
    ):
        names = [t.name for t in targets]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate target names: {names}")
        self.upstream = LakehouseTable(upstream_path)
        self.targets = list(targets)
        self.apply_concurrency = apply_concurrency
        ingest_kw.setdefault("ddl_fast_scan", False)
        self.jobs = {
            t.name: IngestJob(
                t.table_path, os.path.join(control_root, t.name), **ingest_kw
            )
            for t in targets
        }

    def sync_schema(self) -> None:
        for t in self.targets:
            _assert_replica_schema(self.upstream, self.jobs[t.name].table, t.columns)

    def start(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
        fail_after_batches: int | None = None,  # test hook: simulate a crash
    ):
        self.sync_schema()
        applied = {"n": 0}

        def handle(df: DataFrame, batch_id: int) -> None:
            if fail_after_batches is not None and applied["n"] >= fail_after_batches:
                raise RuntimeError("injected crash (test hook)")
            cached = df.persist()
            try:

                def one(t: CascadeTarget) -> None:
                    # watermark filter off for the same mtime-vs-commit-order
                    # reason as CascadeJob (see module docstring)
                    self.jobs[t.name].apply_batch(
                        cached.sparkSession,
                        int(batch_id),
                        _replica_feed(cached, t.row_predicate, t.columns),
                        enforce_watermark=False,
                        ddl_rows=[],
                    )

                workers = max(1, min(self.apply_concurrency, len(self.targets)))
                if workers == 1:
                    for t in self.targets:
                        one(t)
                else:
                    with ThreadPoolExecutor(max_workers=workers) as ex:
                        # list() drains the iterator so the first failure
                        # propagates (fail the batch, resume from checkpoint)
                        list(ex.map(one, self.targets))
            finally:
                cached.unpersist()
            applied["n"] += 1

        writer = (
            self.upstream.stream_changes(spark, max_files_per_trigger)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, spark: SparkSession, checkpoint_dir: str) -> None:
        q = self.start(spark, checkpoint_dir, available_now=True)
        q.awaitTermination()
