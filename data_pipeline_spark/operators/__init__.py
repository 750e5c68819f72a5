"""Core relational operators: last-writer-wins dedup, MERGE apply, and the
corpus-preparation layer (assembly / sampling / redaction / packing)."""

from data_pipeline_spark.operators.corpus import (  # noqa: F401
    PII_PATTERNS,
    assemble_conversations,
    band_buckets,
    connected_components,
    decontaminate,
    doc_shingles,
    minhash_signature,
    pack_sequences,
    redact_pii,
    repetition_profile,
    snapshot_corpus,
    stratified_sample,
    upsample_by_weight,
)
from data_pipeline_spark.operators.lww import lww_dedup, op_rank_expr  # noqa: F401
from data_pipeline_spark.operators.merge import merge_changeset  # noqa: F401
