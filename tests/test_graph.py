"""Iterative PageRank (operators/graph.py): matches a pure-Python
power iteration exactly, conserves rank mass, handles dangling nodes,
and the oracle-SQL generator unrolls the same arithmetic."""

from __future__ import annotations

import duckdb

from sensor_data_pipeline___spark.operators import graph


def _py_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        dang = sum(r[u] for u in nodes if u not in outw)
        nxt = {u: (1.0 - d) / n + d * dang / n for u in nodes}
        for s, t, w in edges:
            nxt[t] += d * r[s] * w / outw[s]
        r = nxt
    return r


EDGES = [
    ("a", "b", 3.0),
    ("a", "c", 1.0),
    ("b", "c", 2.0),
    ("c", "a", 1.0),
    ("c", "d", 1.0),
    # d is dangling: no out-edges
]


def test_pagerank_matches_python_reference_and_conserves_mass(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, weight double")
    got = {r.node: r["rank"] for r in graph.pagerank(df, iters=5).collect()}
    want = _py_pagerank(EDGES, iters=5)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, (u, got[u], want[u])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # teleport + dangling
    # the weighted edge matters: under the 3:1 a->b edge, b ranks
    # strictly higher than with the same topology flattened to
    # uniform weights (where a splits 1:1)
    flat = spark.createDataFrame(
        [(s, t, 1.0) for s, t, _ in EDGES],
        "src string, dst string, weight double",
    )
    got_flat = {
        r.node: r["rank"] for r in graph.pagerank(flat, iters=5).collect()
    }
    assert got["b"] > got_flat["b"]


def test_oracle_sql_generator_matches_spark(spark):
    """pagerank_oracle_sql unrolls the identical iteration: running it
    on DuckDB over the same edge list reproduces the Spark ranks to
    the rounding digit — the contract the gated query relies on."""
    df = spark.createDataFrame(EDGES, "src string, dst string, weight double")
    got = {
        r.node: round(r["rank"], 6)
        for r in graph.pagerank(df, iters=5).collect()
    }
    vals = ", ".join(f"('{s}', '{t}', {w})" for s, t, w in EDGES)
    sql = graph.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(src, dst, w)", iters=5
    )
    want = dict(duckdb.sql(sql).fetchall())
    assert got == {k: round(v, 6) for k, v in want.items()}


def test_iteration_count_changes_result_and_lineage_is_cut(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, weight double")
    r3 = {r.node: r["rank"] for r in graph.pagerank(df, iters=3).collect()}
    r5 = {r.node: r["rank"] for r in graph.pagerank(df, iters=5).collect()}
    assert r3 != r5
    # the returned frame is a checkpoint scan, not a 5x-unrolled join
    # tree: its plan must not contain the join operators themselves
    plan = graph.pagerank(df, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_empty_edge_list_returns_empty_frame(spark):
    """ZeroDivisionError guard (review r9): an empty edge list has no
    nodes to rank — the result is an empty (node, rank) frame, not an
    arithmetic error from the 1/N initialization."""
    df = spark.createDataFrame([], "src string, dst string, weight double")
    out = graph.pagerank(df, iters=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0
