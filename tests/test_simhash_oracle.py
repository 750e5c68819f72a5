"""Bit-equality gate for the 64-bit SimHash UDF (VERDICT round 1 #2).

The vectorized kernel (`_simhash_batch_fn`: one flattened hash_array +
np.add.reduceat fold, zero Python loops) must produce bit-identical
fingerprints to an INDEPENDENT per-document reference implementation that
follows the SimHash definition naively (loop over docs, loop over bits).
Per-row Python is fine here — it's the test oracle, not the data path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_pipeline_spark.driver_queries import _simhash_batch_fn, simhash_docs

SF_DIR = "/root/testdata/sf0.001"


def _reference_simhash(text: str) -> int:
    """Naive per-doc SimHash: token hashes -> per-bit majority -> 64-bit
    word, reinterpreted as two's-complement int64."""
    toks = text.split(" ")
    h = pd.util.hash_array(np.asarray(toks, dtype=object))
    word = np.uint64(0)
    for b in range(64):
        votes = sum(1 if (int(x) >> b) & 1 else -1 for x in h)
        if votes > 0:
            word |= np.uint64(1) << np.uint64(b)
    return int(word.astype(np.uint64).view(np.int64))


def test_simhash_kernel_bit_equality_vs_reference():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    out = pd.concat(list(_simhash_batch_fn(iter([docs]))), ignore_index=True)
    assert len(out) == len(docs)
    expected = [_reference_simhash(t) for t in docs["text"]]
    assert out["simhash"].astype("int64").tolist() == expected


def test_simhash_kernel_batch_invariance():
    """Chunking must not change fingerprints (the reduceat offsets are
    per-batch state — verify a 3-way split equals the single batch)."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    whole = pd.concat(list(_simhash_batch_fn(iter([docs]))), ignore_index=True)
    parts = np.array_split(docs, 3)
    chunked = pd.concat(
        list(_simhash_batch_fn(iter([p.reset_index(drop=True) for p in parts]))),
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        whole.sort_values("doc_id").reset_index(drop=True),
        chunked.sort_values("doc_id").reset_index(drop=True),
    )


def test_simhash_spark_query_matches_kernel(spark):
    got = simhash_docs(spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    local = (
        pd.concat(list(_simhash_batch_fn(iter([docs]))), ignore_index=True)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), local, check_dtype=False
    )
