"""The driver's correctness gate checks the FIRST 50 entries of
``__spark_entry__.queries()``. Round 2 shipped 53 and silently lost the
oracle rows for the interval-join / window-frame / pivot categories. Pin the
contract: at most 50 driver-facing entries, the category-bearing queries
registered first, every oracle key present in the registry, and the
registry-excluded alternate implementations still alive in the full operator
registry (bench + pytest consume them from there)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from data_pipeline_spark import driver_queries  # noqa: E402


def test_registry_fits_check_window():
    q = entry_mod.queries()
    assert len(q) <= 50, f"{len(q)} entries overflow the driver's 50-query window"


def test_category_queries_front_loaded():
    names = list(entry_mod.queries())
    window = set(names[:50])
    for must in (
        "interval_join_signup_followup",
        "cumulative_revenue_by_customer",
        "orders_pivot_status",
        "lww_latest_by_user",
        "cdc_apply_merge",
        "asof_prev_click_per_purchase",
        "grouping_sets_revenue",
    ):
        assert must in window, f"{must} outside the checked window"


def test_oracle_keys_subset_of_queries():
    q, sql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(sql) <= set(q)
    # only the two declared rows-only entries may lack an oracle
    assert set(q) - set(sql) == {"cdc_replay_transcripts"} | (
        {"simhash_docs"} & set(q)
    )


def test_excluded_alternates_still_in_operator_registry():
    for name in entry_mod._EXCLUDE:
        assert name in driver_queries.Q, f"{name} dropped from Q, bench breaks"


def test_no_duplicate_names_and_callables_resolve():
    q = entry_mod.queries()
    assert len(q) == len(set(q))
    for name, fn in q.items():
        assert callable(fn), name
