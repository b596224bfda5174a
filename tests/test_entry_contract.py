"""Driver-contract invariants for __spark_entry__ (no Spark session
needed): the 50-entry gate window must stay full, unique, registered,
and 100% oracle-hash-verifiable — the properties the round-3 registry
reorder established."""

from __future__ import annotations

import __spark_entry__ as entry


def test_priority_window_is_exactly_50():
    assert len(entry._PRIORITY) == 50
    assert len(set(entry._PRIORITY)) == 50


def test_priority_names_all_registered():
    missing = [n for n in entry._PRIORITY if n not in entry._q.QUERIES]
    assert not missing, missing


def test_first_50_all_oracle_backed():
    q = entry.queries()
    o = entry.oracle_sql()
    first50 = list(q)[:50]
    assert first50 == list(entry._PRIORITY)
    unbacked = [n for n in first50 if not o.get(n, "").strip()]
    assert not unbacked, unbacked


def test_registry_complete_after_reorder():
    # the reorder must only reorder — every registered query appears
    # exactly once
    q = entry.queries()
    assert set(q) == set(entry._q.QUERIES)
    assert len(q) == len(entry._q.QUERIES)
