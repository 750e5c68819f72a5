"""Incrementally-maintained DOCUMENTS view of the transcript table.

`assemble_conversations` turns the turn-grained CDC table into training
documents; this module keeps that result LIVE as conversations keep
changing, without ever re-assembling the whole corpus:

    upstream.stream_changes → touched conv_ids → bucket-pruned point read
    → re-assemble ONLY those conversations → merge into the docs table
    through the engine's own idempotent apply path

Per micro-batch the work is O(churn): the changelog batch names the
conversations whose document image may have changed; everything else in
the corpus is untouched. The point read prunes to the buckets those
conv_ids hash into (metadata-level file skipping), the re-assembly
aggregates only their turns, and the merge is the same two-shuffle
bucketed plan as any ingest batch. At 100 TB a day's churn is a few
thousand conversations — the refresh costs minutes of one executor, not
a corpus-wide rebuild.

Semantics: the view is a MATERIALIZED VIEW refresh, not a transcript
replica — each batch re-reads the touched conversations' CURRENT state,
so the view always converges to `assemble_conversations(upstream)` as of
the latest refresh, whatever order catch-up micro-batches arrive in.
Conversations whose turns are all deleted upstream produce a DELETE of
their document. Emitted rows carry the upstream watermark LSN at refresh
time: monotone across refreshes, so the engine's LWW keeps the newest
image; equal-LSN collisions can only carry identical images (same
upstream snapshot) and are harmless under the D>U>I tie-break.

Exactly-once: checkpoint re-delivery is skipped by batch_id like every
engine sink — and a replayed refresh would be a no-op anyway (it
re-derives the same images from the same upstream state).

DML only, MOR upstream required (same contract as cascade edges —
reference: data_pipeline's applier chain publishing to further consumers,
SURVEY.md §2 K1/S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.operators.corpus import assemble_conversations, redact_pii
from data_pipeline_spark.plans.table_format import LakehouseTable
from data_pipeline_spark.streaming.ingest import IngestJob

#: Schema of the documents view table. `turn_idx` is constant 0 — a
#: document is one row per conversation, and pinning the second merge-key
#: component lets the view reuse the engine's (conv_id, turn_idx) apply
#: path unchanged.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("doc_text", T.StringType(), nullable=True),
        T.StructField("n_turns", T.IntegerType(), nullable=True),
        T.StructField("n_chars", T.IntegerType(), nullable=True),
    ]
)


class CorpusViewJob:
    """Keep a documents table equal to `assemble_conversations(upstream)`
    by incremental refresh over the upstream changelog stream.

    redact: apply `redact_pii` to each re-assembled document (the default
    single-pass scrub — the view keeps the corpus schema, no counts column).
    max_turns: training-window truncation, pushed into the point read."""

    def __init__(
        self,
        upstream_path: str,
        view_path: str,
        control_path: str,
        redact: bool = False,
        max_turns: int | None = None,
        high_churn_threshold: int = 100_000,
        **ingest_kw,
    ):
        self.upstream = LakehouseTable(upstream_path)
        self.redact = redact
        self.max_turns = max_turns
        # Above this many distinct touched conversations per refresh the
        # point-read path stops making sense: collecting the id list pushes
        # megabytes through the driver and the isin filter, and with every
        # bucket touched the pruning buys nothing. Past the cap we switch to
        # a distributed semi-join of the changed ids against the upstream
        # read (same shape as the DDL-bomb cap in multi_table.py) — zero
        # driver-side materialization, correct for a post-initsync or
        # backfill batch touching 100% of conversations.
        self.high_churn_threshold = high_churn_threshold
        #: refresh-path telemetry: "point" (collected id list, bucket/key-
        #: range pruned) or "semi_join" (high-churn distributed path) —
        #: set per refresh, readable by tests and operators.
        self.last_refresh_mode: str | None = None
        # the cascade feed is DML-only; skip the DDL probe outright
        ingest_kw.setdefault("ddl_fast_scan", False)
        self.job = IngestJob(view_path, control_path, **ingest_kw)

    @staticmethod
    def create_view_table(path: str, n_buckets: int = 128, **create_kw) -> None:
        LakehouseTable(path).create(DOCUMENT_SCHEMA, n_buckets=n_buckets, **create_kw)

    # -------------------------------------------------------------- refresh
    def _refresh_feed(self, spark: SparkSession, changed: DataFrame) -> DataFrame:
        """One refresh: changed conv_ids → current document images as a
        change-event feed (U with the full image; D when every turn of the
        conversation is gone upstream).

        Two regimes, picked by ONE cheap count-distinct over the batch:
        - churn ≤ high_churn_threshold (the design point — daily churn ≪
          corpus): collect the id list and point-read it (bucket pruning +
          manifest key-range skipping → O(churn) files touched);
        - churn above the cap (initsync fallout, backfill, full overwrite):
          semi-join the changed-ids frame against the upstream read — the
          id set never lands on the driver, and the refresh degrades
          gracefully into one distributed pass instead of a giant isin."""
        changed_ids = changed.select("conv_id").distinct()
        n_changed = changed_ids.count()
        lsn = self.upstream.current_snapshot().get("watermark_lsn") or 0
        if n_changed <= self.high_churn_threshold:
            self.last_refresh_mode = "point"
            ids = [r["conv_id"] for r in changed_ids.collect()]
            turns = self.upstream.read(spark, conv_ids=ids)
        else:
            self.last_refresh_mode = "semi_join"
            turns = self.upstream.read(spark).join(changed_ids, "conv_id", "semi")
        docs = assemble_conversations(turns, max_turns=self.max_turns)
        if self.redact:
            docs = redact_pii(docs, text_col="doc_text")
        upserts = docs.select(
            F.lit(lsn).alias("lsn"),
            F.lit("U").alias("op"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.col("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.to_json(F.struct("doc_text", "n_turns", "n_chars")).alias("payload"),
        )
        # a touched conversation with no surviving turns → delete its doc
        deletes = (
            changed_ids
            .join(docs.select("conv_id"), "conv_id", "left_anti")
            .select(
                F.lit(lsn).alias("lsn"),
                F.lit("D").alias("op"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.col("conv_id"),
                F.lit(0).alias("turn_idx"),
                F.lit(None).cast("string").alias("payload"),
            )
        )
        return upserts.unionByName(deletes)

    def refresh_for(self, spark: SparkSession, batch_id: int, changed: DataFrame) -> dict:
        """Apply one refresh batch (exposed for tests / batch callers)."""
        return self.job.apply_batch(
            spark,
            batch_id,
            self._refresh_feed(spark, changed),
            enforce_watermark=False,
            ddl_rows=[],
        )

    # ------------------------------------------------------------- streaming
    def start(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
    ):
        """Tail the upstream changelog and refresh per micro-batch.
        available_now=True drains the retained changelog and stops."""
        if self.upstream.current_snapshot().get("merge_mode") != "mor":
            raise ValueError(
                f"corpus view upstream {self.upstream.path} is copy-on-write: "
                "COW merges produce no delta files, so the changelog stream "
                "would be empty — use merge_mode='mor'"
            )

        def handle(df: DataFrame, batch_id: int) -> None:
            self.refresh_for(df.sparkSession, int(batch_id), df)

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

    # ----------------------------------------------------- cursor-driven mode
    def poll_once(self, spark: SparkSession, cursor_path: str) -> dict:
        """One cursor-driven refresh — the WAP-SAFE mode (same rationale as
        `CascadeJob.poll_once`): `start()` tails the upstream delta FILES,
        which on a write-audit-publish upstream include staged and
        later-discarded batches, so the view could briefly assemble
        documents from conversations whose changes were never published.
        This mode reads the PUBLISHED chain via `tail_changes`; the refresh
        re-derives touched conversations from the CURRENT published state,
        so the view converges on exactly the audited corpus. The cursor
        commits after the merge; a lost commit just re-refreshes the same
        conversations to the same images (view refresh is idempotent by
        construction)."""
        chg, cursor = self.upstream.tail_changes(spark, cursor_path)
        if chg is None:
            return {"applied": False, "cursor": cursor}
        batch_id = cursor["snapshot_id"]
        res = self.refresh_for(spark, batch_id, chg.select("conv_id"))
        LakehouseTable.commit_cursor(cursor_path, cursor)
        return {"applied": True, "batch_id": batch_id, "cursor": cursor,
                "result": res}

    def run_until_caught_up(
        self, spark: SparkSession, cursor_path: str, max_polls: int = 1000
    ) -> int:
        """Poll until the view reflects the full published upstream head;
        raises if still behind after max_polls (never a silent partial)."""
        n = 0
        for _ in range(max_polls):
            if not self.poll_once(spark, cursor_path)["applied"]:
                return n
            n += 1
        raise RuntimeError(
            f"view still behind after {max_polls} windows — raise max_polls "
            "or keep polling"
        )

    def lag(self) -> dict:
        """Refresh lag in LSNs (same metadata-only metric as cascade edges)."""
        up = self.upstream.current_snapshot().get("watermark_lsn") or 0
        down = self.job.table.current_snapshot().get("watermark_lsn") or 0
        return {"upstream_lsn": up, "view_lsn": down, "lag_lsns": up - down}
