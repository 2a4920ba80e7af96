"""Driver-contract registry invariants.

The driver's correctness gate hash-checks only the FIRST 50 registry
entries, and ``__spark_entry__._GATE_PRIORITY`` decides that order — a
typo there is silently skipped (the lookup is ``if n in reg``), which
would quietly rotate the wrong queries into the external gate. These
tests make registry-shape mistakes loud instead of silent.
"""

from __future__ import annotations

import __spark_entry__ as entry


def _registry():
    return entry._registry()


def test_gate_priority_names_all_exist():
    reg = _registry()
    missing = [n for n in entry._GATE_PRIORITY if n not in reg]
    assert not missing, (
        f"_GATE_PRIORITY names not in the registry (typo? renamed "
        f"query?): {missing}"
    )


def test_gate_priority_has_no_duplicates():
    dups = [n for n in entry._GATE_PRIORITY
            if entry._GATE_PRIORITY.count(n) > 1]
    assert not dups, f"duplicated priority entries: {sorted(set(dups))}"


def test_gate_window_is_fully_oracle_checked():
    """Every query inside the driver's 50-row window must carry a
    DuckDB oracle (a rows-only check there wastes a hash-gate slot)."""
    reg = _registry()
    window = list(reg)[:50]
    weak = [n for n in window if reg[n][1] is None]
    assert not weak, f"gate-window queries without oracle SQL: {weak}"


def test_registry_entries_are_fn_sql_pairs():
    reg = _registry()
    for name, (fn, sql) in reg.items():
        assert callable(fn), name
        assert sql is None or (
            isinstance(sql, str) and "SELECT" in sql.upper()
        ), name
