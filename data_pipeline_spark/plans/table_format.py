"""Copy-on-write lakehouse table with an atomic JSON commit log.

The sandbox ships no Iceberg/Delta jars, so Iceberg semantics are emulated
(SURVEY.md §0): atomic snapshot commits, field-id-based schema evolution
(add / rename / type-widen), time travel by snapshot id, and bucket-pruned
copy-on-write MERGE. The public surface (`create / read / merge / apply_ddl /
overwrite`) is deliberately the shape of Iceberg's — on a cluster with the
Iceberg runtime, `merge` becomes a single `MERGE INTO ... WHEN MATCHED ...`
and `apply_ddl` becomes `ALTER TABLE` statements; nothing else changes.

Layout (all paths relative to the table root):

    _meta/version-hint.txt        name of the current snapshot file; updated
                                  by atomic rename (POSIX) — crash-safe; an
                                  orphaned snapshot json is simply unreachable
    _meta/snapshot-<n>.json       {snapshot_id, parent, kind, batch_id,
                                   last_batch_id, schema_id, files, stats}
    _meta/schema-<k>.json         {schema_id, fields:[{id,name,type,former_names}]}
    data/s<n>/_bucket=<b>/*.parquet   files written by snapshot n

Data files carry the engine column ``_lsn`` (last writer's LSN per row) so
merges reconcile by LSN; files are bucketed by ``pmod(xxhash64(conv_id), B)``
so a merge rewrites only affected buckets (the reference applies DML row-by-
row against a PK index — data_pipeline/applier/postgres_applier.py; columnar
COW is the architectural replacement, SURVEY.md §4).

Exactly-once: `merge` is idempotent by batch_id — foreachBatch batch ids are
monotonically increasing, so a replayed batch (id ≤ last_batch_id) is a no-op
(the reference's analog: skip records with lsn ≤ recovery point, SURVEY.md §2
T4). Single-writer assumed (one streaming query); multi-writer needs real
Iceberg optimistic concurrency.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.operators.merge import merge_changeset
from data_pipeline_spark.schemas import LSN_COL

_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
}
_WIDENS = {("int", "long"), ("float", "double")}


def _spark_type(name: str) -> T.DataType:
    if name not in _TYPES:
        raise ValueError(f"unsupported column type: {name}")
    return _TYPES[name]


class LakehouseTable:
    """One table = one directory. Cheap to construct; state lives on disk."""

    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "_meta")

    # ------------------------------------------------------------------ meta
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.txt")

    def exists(self) -> bool:
        return os.path.exists(self._hint_path())

    def current_snapshot(self) -> dict:
        with open(self._hint_path()) as f:
            name = f.read().strip()
        return self._load_snapshot(name)

    def _load_snapshot(self, name: str) -> dict:
        with open(os.path.join(self.meta_dir, name)) as f:
            snap = json.load(f)
        snap["_name"] = name
        return snap

    def snapshot_by_id(self, snapshot_id: int) -> dict:
        return self._load_snapshot(f"snapshot-{snapshot_id:08d}.json")

    def _load_schema(self, schema_id: int) -> dict:
        with open(os.path.join(self.meta_dir, f"schema-{schema_id}.json")) as f:
            return json.load(f)

    def schema_struct(self, snap: dict | None = None) -> T.StructType:
        """Current (or a given snapshot's) schema as a Spark StructType."""
        snap = snap or self.current_snapshot()
        sch = self._load_schema(snap["schema_id"])
        return T.StructType(
            [T.StructField(f["name"], _spark_type(f["type"]), True) for f in sch["fields"]]
        )

    def renames(self, snap: dict | None = None) -> dict[str, list[str]]:
        """current column name -> historical names (for payload decode)."""
        snap = snap or self.current_snapshot()
        sch = self._load_schema(snap["schema_id"])
        return {f["name"]: f["former_names"] for f in sch["fields"] if f["former_names"]}

    def _write_json(self, name: str, obj: dict) -> None:
        p = os.path.join(self.meta_dir, name)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.rename(tmp, p)

    def _commit(self, snap: dict) -> None:
        """Write the snapshot json, then atomically swing the version hint."""
        name = f"snapshot-{snap['snapshot_id']:08d}.json"
        self._write_json(name, snap)
        tmp = self._hint_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(name)
        os.rename(tmp, self._hint_path())  # atomic on POSIX

    # ---------------------------------------------------------------- create
    def create(self, schema: T.StructType, n_buckets: int = 128) -> None:
        """Create an empty table. n_buckets bounds merge write parallelism —
        size it ≥ 4N executor cores so the COW write path scales (SURVEY.md
        §7 hard part c)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString(), "former_names": []}
            for i, f in enumerate(schema.fields)
        ]
        self._write_json("schema-0.json", {"schema_id": 0, "fields": fields})
        self._commit(
            {
                "snapshot_id": 0,
                "parent": None,
                "kind": "create",
                "batch_id": None,
                "last_batch_id": -1,
                "schema_id": 0,
                "n_buckets": n_buckets,
                "watermark_lsn": 0,
                "files": [],  # [{path, bucket, schema_id}]
                "stats": {},
                "committed_at": time.time(),
            }
        )

    # ------------------------------------------------------------------ read
    def read(self, spark: SparkSession, snapshot_id: int | None = None, with_lsn: bool = False) -> DataFrame:
        """Read the table at the current (or a past) snapshot, projected to
        that snapshot's schema. Files written under older schema versions are
        mapped by field id: renamed columns aliased, widened columns cast,
        later-added columns null-filled — all metadata-only, no data rewrite.
        """
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot_by_id(snapshot_id)
        cur = self._load_schema(snap["schema_id"])
        cur_fields = cur["fields"]
        out_cols = [f["name"] for f in cur_fields] + ([LSN_COL] if with_lsn else [])

        if not snap["files"]:
            struct = self.schema_struct(snap)
            if with_lsn:
                struct = T.StructType(struct.fields + [T.StructField(LSN_COL, T.LongType(), True)])
            return spark.createDataFrame([], struct)

        by_schema: dict[int, list[str]] = {}
        for entry in snap["files"]:
            by_schema.setdefault(entry["schema_id"], []).append(
                os.path.join(self.path, entry["path"])
            )

        parts = []
        for schema_id, paths in sorted(by_schema.items()):
            written = self._load_schema(schema_id)
            by_id = {f["id"]: f for f in written["fields"]}
            cols = []
            for f in cur_fields:
                w = by_id.get(f["id"])
                if w is None:
                    cols.append(F.lit(None).cast(_spark_type(f["type"])).alias(f["name"]))
                else:
                    cols.append(F.col(w["name"]).cast(_spark_type(f["type"])).alias(f["name"]))
            cols.append(F.col(LSN_COL))
            parts.append(spark.read.parquet(*paths).select(*cols))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.select(*out_cols)

    def _read_buckets(self, spark: SparkSession, snap: dict, buckets: set[int]) -> DataFrame | None:
        """Read only the given buckets' files (merge-side pruning)."""
        entries = [e for e in snap["files"] if e["bucket"] in buckets]
        if not entries:
            return None
        pruned = dict(snap)
        pruned["files"] = entries
        return self.read_from_snapshot_dict(spark, pruned)

    def read_from_snapshot_dict(self, spark: SparkSession, snap: dict) -> DataFrame:
        by_schema: dict[int, list[str]] = {}
        for entry in snap["files"]:
            by_schema.setdefault(entry["schema_id"], []).append(
                os.path.join(self.path, entry["path"])
            )
        cur_fields = self._load_schema(snap["schema_id"])["fields"]
        parts = []
        for schema_id, paths in sorted(by_schema.items()):
            written = self._load_schema(schema_id)
            by_id = {f["id"]: f for f in written["fields"]}
            cols = []
            for f in cur_fields:
                w = by_id.get(f["id"])
                if w is None:
                    cols.append(F.lit(None).cast(_spark_type(f["type"])).alias(f["name"]))
                else:
                    cols.append(F.col(w["name"]).cast(_spark_type(f["type"])).alias(f["name"]))
            cols.append(F.col(LSN_COL))
            parts.append(spark.read.parquet(*paths).select(*cols))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ----------------------------------------------------------------- write
    def bucket_expr(self, n_buckets: int) -> F.Column:
        return F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")

    def _write_data(self, df: DataFrame, snapshot_id: int, schema_id: int, n_buckets: int) -> list[dict]:
        """Write rows (must include _bucket and _lsn) under data/s<id>/ and
        return file entries. One shuffle: repartition by _bucket so writes
        parallelize across affected buckets."""
        rel = f"data/s{snapshot_id}"
        out = os.path.join(self.path, rel)
        (
            df.repartition(n_buckets, F.col("_bucket"))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out)
        )
        entries = []
        for bdir in sorted(os.listdir(out)):
            if not bdir.startswith("_bucket="):
                continue
            b = int(bdir.split("=")[1])
            for fn in sorted(os.listdir(os.path.join(out, bdir))):
                if fn.endswith(".parquet"):
                    entries.append(
                        {"path": f"{rel}/{bdir}/{fn}", "bucket": b, "schema_id": schema_id}
                    )
        return entries

    def overwrite(self, spark: SparkSession, df: DataFrame, batch_id: int | None = None) -> dict:
        """Full snapshot load (the initsync path — reference:
        data_pipeline/initsync_pipe.py; SURVEY.md §2 S3/K4). df must have the
        current schema; `_lsn` defaults to 0 if absent."""
        snap = self.current_snapshot()
        if LSN_COL not in df.columns:
            df = df.withColumn(LSN_COL, F.lit(0).cast("long"))
        data = df.withColumn("_bucket", self.bucket_expr(snap["n_buckets"]))
        new_id = snap["snapshot_id"] + 1
        entries = self._write_data(data, new_id, snap["schema_id"], snap["n_buckets"])
        new = {
            **{k: snap[k] for k in ("schema_id", "n_buckets")},
            "snapshot_id": new_id,
            "parent": snap["snapshot_id"],
            "kind": "overwrite",
            "batch_id": batch_id,
            "last_batch_id": max(snap["last_batch_id"], batch_id if batch_id is not None else -1),
            "files": entries,
            "stats": {},
            "committed_at": time.time(),
        }
        self._commit(new)
        return new

    # ----------------------------------------------------------------- merge
    def merge(self, spark: SparkSession, batch_id: int, changes: DataFrame) -> dict:
        """Copy-on-write MERGE of a deduped changeset (≤1 row per key, with
        `lsn` and `op` columns plus the table columns).

        Iceberg equivalent (one statement, when the jar is present):
          MERGE INTO t USING s ON t.conv_id=s.conv_id AND t.turn_idx=s.turn_idx
          WHEN MATCHED AND s.op='D' THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED AND s.op!='D' THEN INSERT *

        Idempotent: batch_id ≤ last committed batch_id → no-op (exactly-once
        over at-least-once replay). Returns {skipped|stats...}.
        """
        snap = self.current_snapshot()
        if batch_id <= snap["last_batch_id"]:
            return {"skipped": True, "batch_id": batch_id, "snapshot_id": snap["snapshot_id"]}

        n_buckets = snap["n_buckets"]
        cur_schema = self._load_schema(snap["schema_id"])
        data_cols = [f["name"] for f in cur_schema["fields"]]

        # LSN recovery filter (reference T4: skip records with lsn ≤ last
        # applied — SURVEY.md §2). Makes redelivered chunks (at-least-once
        # transport) no-ops without tombstones: the feed is log-ordered
        # across batches, so anything at or below the table watermark has
        # already taken effect.
        watermark = snap.get("watermark_lsn") or 0
        changes = changes.where(F.col("lsn") > F.lit(watermark))

        changes = changes.withColumn("_bucket", self.bucket_expr(n_buckets))
        # Affected-bucket pruning (tiny collect: ≤ n_buckets ints + max lsn).
        head = changes.agg(
            F.collect_set("_bucket").alias("b"), F.max("lsn").alias("m")
        ).first()
        affected = set(head["b"])
        new_watermark = max(watermark, head["m"] or 0)
        if not affected:
            # fully-duplicate batch: metadata-only commit advancing batch_id
            new = {
                **{k: snap[k] for k in ("schema_id", "n_buckets", "files")},
                "snapshot_id": snap["snapshot_id"] + 1,
                "parent": snap["snapshot_id"],
                "kind": "merge",
                "batch_id": batch_id,
                "last_batch_id": batch_id,
                "watermark_lsn": watermark,
                "stats": {"affected_buckets": 0},
                "committed_at": time.time(),
            }
            self._commit(new)
            return {"skipped": False, "batch_id": batch_id, "snapshot_id": new["snapshot_id"],
                    "affected_buckets": 0, "rows_filtered_by_watermark": True}

        existing = self._read_buckets(spark, snap, affected)
        chg = changes.select(
            F.col("lsn"),
            F.col("op"),
            F.col("_bucket"),
            *[F.col(c) for c in data_cols],
        )
        exi = None
        if existing is not None:
            exi = existing.select(
                F.col(LSN_COL).alias("lsn"),
                F.lit("I").alias("op"),
                self.bucket_expr(n_buckets).alias("_bucket"),
                *[F.col(c) for c in data_cols],
            )
        live = merge_changeset(exi, chg, data_cols).withColumnRenamed("lsn", LSN_COL)

        new_id = snap["snapshot_id"] + 1
        new_entries = self._write_data(live, new_id, snap["schema_id"], n_buckets)
        carried = [e for e in snap["files"] if e["bucket"] not in affected]
        new = {
            "snapshot_id": new_id,
            "parent": snap["snapshot_id"],
            "kind": "merge",
            "batch_id": batch_id,
            "last_batch_id": batch_id,
            "schema_id": snap["schema_id"],
            "n_buckets": n_buckets,
            "watermark_lsn": new_watermark,
            "files": carried + new_entries,
            "stats": {"affected_buckets": len(affected)},
            "committed_at": time.time(),
        }
        self._commit(new)
        return {"skipped": False, "batch_id": batch_id, "snapshot_id": new_id,
                "affected_buckets": len(affected)}

    # ------------------------------------------------------------------- DDL
    def apply_ddl(self, descriptors: list[dict]) -> dict:
        """Metadata-only schema evolution, mirroring the reference's DDL
        replication (data_pipeline/sql/ DDL parse + applier DDL branch,
        SURVEY.md §2 T8). Supported: add_column / rename_column / widen_type.
        No data files are touched; old files are re-mapped at read time by
        field id."""
        if not descriptors:
            return {"skipped": True}
        snap = self.current_snapshot()
        sch = self._load_schema(snap["schema_id"])
        fields = [dict(f) for f in sch["fields"]]
        by_name = {f["name"]: f for f in fields}
        for d in descriptors:
            action = d["action"]
            if action == "add_column":
                if d["name"] in by_name:
                    continue  # idempotent re-add
                nf = {
                    "id": max(f["id"] for f in fields) + 1,
                    "name": d["name"],
                    "type": d["type"],
                    "former_names": [],
                }
                fields.append(nf)
                by_name[nf["name"]] = nf
            elif action == "rename_column":
                f = by_name.pop(d["old"], None)
                if f is None:
                    if d["new"] in by_name:
                        continue  # already renamed (replay)
                    raise ValueError(f"rename: no column {d['old']}")
                f["former_names"] = f["former_names"] + [d["old"]]
                f["name"] = d["new"]
                by_name[d["new"]] = f
            elif action == "widen_type":
                f = by_name[d["name"]]
                if f["type"] == d["to"]:
                    continue  # already widened (replay)
                if (f["type"], d["to"]) not in _WIDENS:
                    raise ValueError(f"illegal widen {f['type']} -> {d['to']}")
                f["type"] = d["to"]
            else:
                raise ValueError(f"unknown DDL action {action}")
        new_schema_id = snap["schema_id"] + 1
        self._write_json(
            f"schema-{new_schema_id}.json", {"schema_id": new_schema_id, "fields": fields}
        )
        new = {
            **snap,
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent": snap["snapshot_id"],
            "kind": "ddl",
            "batch_id": None,
            "schema_id": new_schema_id,
            "committed_at": time.time(),
        }
        new.pop("_name", None)
        self._commit(new)
        return {"skipped": False, "schema_id": new_schema_id}
