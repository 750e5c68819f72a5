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

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.sources.kafka import changes_to_feed
from data_pipeline_spark.streaming.ingest import IngestJob


class CascadeJob:
    """One replication edge: tail `upstream`'s changelog live and keep
    `downstream` identical. Construction mirrors IngestJob (the downstream
    half IS an IngestJob over the cascade feed)."""

    def __init__(
        self,
        upstream_path: str,
        downstream_path: str,
        control_path: str,
        **ingest_kw,
    ):
        self.upstream = LakehouseTable(upstream_path)
        # ddl_fast_scan would probe the upstream DELTA files for an `op`
        # column they don't have; the cascade feed is DML-only by contract,
        # so the probe is skipped outright via ddl_rows=[] in the handler.
        ingest_kw.setdefault("ddl_fast_scan", False)
        self.job = IngestJob(downstream_path, control_path, **ingest_kw)

    def sync_schema(self) -> None:
        """Assert the downstream schema matches the upstream one (names and
        types, in order). Cascades replicate DML only — run this at edge
        start and after any upstream DDL (apply the same DDL descriptors
        downstream, then restart the stream)."""
        up = [
            (f["name"], f["type"])
            for f in self.upstream._load_schema(
                self.upstream.current_snapshot()["schema_id"]
            )["fields"]
        ]
        down_tbl = self.job.table
        down = [
            (f["name"], f["type"])
            for f in down_tbl._load_schema(
                down_tbl.current_snapshot()["schema_id"]
            )["fields"]
        ]
        if up != down:
            raise ValueError(
                "cascade schema drift (apply upstream DDL downstream, then "
                f"restart the edge): upstream={up} downstream={down}"
            )

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
                changes_to_feed(df),
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
