"""Every operator in the full registry (driver_queries.Q) that carries a
DuckDB oracle stays oracle-checked even when it lives OUTSIDE the driver's
50-query window: the round-4 swap moved doc_fingerprints /
status_except_customers / lang_source_profile out of the window to make
room for the corpus-assembly rows, and the lww/simhash alternates were
already window-excluded in round 3. This test runs the excluded-with-SQL
entries through the SAME compare the driver uses (row count + sorted-column
schema + order-insensitive value hash, scripts/check_contract.py) at
sf0.01 — so "outside the window" never means "unchecked"."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


entry_mod = _load(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__")
contract = _load(os.path.join(REPO, "scripts", "check_contract.py"), "check_contract")

from data_pipeline_spark import driver_queries  # noqa: E402

#: the window-excluded entries that have an oracle — exactly the swap set
#: plus any alternate that oracles against its own SQL (lww alternates and
#: simhash_docs intentionally share SQL with / equality-gate against a kept
#: entry, so they're compared here too when SQL exists for them).
OFFWINDOW = sorted(
    name for name in entry_mod._EXCLUDE if name in driver_queries.SQL
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_swap_set_is_covered():
    # the round-4 swap-outs plus round 5's (multimodal_frame_sample, which
    # made room for decontaminate_docs) must be in the off-window checked set
    assert {"doc_fingerprints", "status_except_customers",
            "lang_source_profile", "multimodal_frame_sample"} <= set(OFFWINDOW)
    # ...and decontaminate_docs must now be gone from it (it's in-window)
    assert "decontaminate_docs" not in OFFWINDOW


@pytest.mark.parametrize("name", OFFWINDOW)
def test_offwindow_query_matches_oracle(spark, duck, name):
    sdf = driver_queries.Q[name](spark, SF_DIR).toPandas()
    odf = duck.execute(driver_queries.SQL[name]).fetchdf()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert contract.frame_hash(sdf) == contract.frame_hash(odf), name
