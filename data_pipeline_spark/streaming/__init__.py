"""Structured Streaming ingest: micro-batch apply loop + control table."""

from data_pipeline_spark.streaming.cascade import (  # noqa: F401
    CascadeFanout,
    CascadeJob,
    CascadeTarget,
    filter_replica_changes,
)
from data_pipeline_spark.streaming.corpus_view import (  # noqa: F401
    CorpusViewJob,
    export_corpus_delta,
    list_corpus_deltas,
    read_corpus_deltas,
    touched_documents,
)
from data_pipeline_spark.streaming.dedup_index import DedupIndexJob  # noqa: F401
from data_pipeline_spark.streaming.ingest import IngestJob  # noqa: F401
from data_pipeline_spark.streaming.txn import TxnAligner, TxnCatalog  # noqa: F401
from data_pipeline_spark.streaming.wap import (  # noqa: F401
    AuditFailedError,
    WapIngestJob,
    audit_changes_clean,
    audit_row_delta,
    audit_unique_key,
    combine_audits,
)
