"""Hashed-ngram linear classifier (operators/classifier.py): matches
a pure-Python centered-GD reference, learns a planted signal, is
partition-layout invariant (the DECIMAL-exact-sum claim), scores
zero-token docs through the bias feature, and the oracle generator
replays the identical fit in DuckDB."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import classifier as clf
from sensor_data_pipeline___spark.plans.explain import (
    broadcast_join_count,
    formatted_plan,
)

# Planted signal: docs carrying "noise" tokens only are label 1;
# docs salted with "spamword" are label 0. 12 docs, separable.
DOCS = [
    (1, "alpha beta gamma delta", 1),
    (2, "beta gamma epsilon zeta", 1),
    (3, "alpha zeta eta theta", 1),
    (4, "eta theta alpha beta", 1),
    (5, "gamma delta epsilon alpha", 1),
    (6, "delta epsilon zeta eta", 1),
    (7, "spamword alpha beta", 0),
    (8, "spamword spamword gamma", 0),
    (9, "delta spamword zeta", 0),
    (10, "spamword eta spamword", 0),
    (11, "", 1),  # zero tokens: bias-only
    (12, "theta spamword alpha spamword", 0),
]


def _py_bucket(tok: str, salt: str = clf.SALT, nb: int = clf.N_BUCKETS):
    h = hashlib.md5(f"{salt}|{tok}".encode()).hexdigest()
    return int(h[:8], 16) % nb


def _py_fit_score(docs, iters, lr):
    """Pure-Python centered GD twin (dense centering — algebraically
    identical to the operator's sparse identity; float summation
    order differs, hence the 1e-7 tolerance, not exactness)."""
    feats = {}  # (doc, bucket) -> x
    for did, text, _ in docs:
        for tok in text.split(" "):
            if tok:
                key = (did, _py_bucket(tok))
                feats[key] = feats.get(key, 0.0) + 1.0
        feats[(did, clf.BIAS_BUCKET)] = 1.0
    n = float(len(docs))
    buckets = sorted({b for _, b in feats})
    m = {
        b: (
            0.0
            if b == clf.BIAS_BUCKET
            else sum(x for (_, bb), x in feats.items() if bb == b) / n
        )
        for b in buckets
    }
    y = {did: float(lab) for did, _, lab in docs}
    w = {b: 0.0 for b in buckets}

    def fsig(s):
        return 0.5 + 0.5 * s / (1.0 + abs(s))

    for _ in range(iters):
        c = sum(m[b] * w[b] for b in buckets)
        s = {did: -c for did in y}
        for (did, b), x in feats.items():
            s[did] += x * w[b]
        r = {did: y[did] - fsig(s[did]) for did in y}
        rtot = sum(r.values())
        g = {b: -m[b] * rtot for b in buckets}
        for (did, b), x in feats.items():
            g[b] += x * r[did]
        for b in buckets:
            w[b] += (lr / n) * g[b]
    c = sum(m[b] * w[b] for b in buckets)
    s = {did: -c for did in y}
    for (did, b), x in feats.items():
        s[did] += x * w[b]
    return w, {did: fsig(s[did]) for did in y}


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def _labels_df(spark):
    return spark.createDataFrame(
        [(i, float(lab)) for i, _, lab in DOCS], "doc_id long, label double"
    )


def test_fit_and_score_match_python_reference(spark):
    feats = clf.featurize_hashed(_docs_df(spark))
    w = clf.fit_linear_classifier(
        feats, _labels_df(spark), iters=4, lr=2.0
    )
    got_w = {r["bucket"]: r["w"] for r in w.collect()}
    got_s = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score(feats, w).collect()
    }
    want_w, want_s = _py_fit_score(DOCS, iters=4, lr=2.0)
    assert set(got_w) == set(want_w)
    for b in want_w:
        assert abs(got_w[b] - want_w[b]) < 1e-7, (b, got_w[b], want_w[b])
    for did in want_s:
        assert abs(got_s[did] - want_s[did]) < 1e-7


def test_learns_planted_signal(spark):
    feats = clf.featurize_hashed(_docs_df(spark))
    w = clf.fit_linear_classifier(feats, _labels_df(spark))
    scores = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score(feats, w).collect()
    }
    pos = [s for did, s in scores.items() if dict((i, l) for i, _, l in DOCS)[did] == 1]
    neg = [s for did, s in scores.items() if dict((i, l) for i, _, l in DOCS)[did] == 0]
    # every spamword doc scores below every clean doc — the planted
    # marker token is linearly separable
    assert max(neg) < min(pos), (max(neg), min(pos))


def test_fit_is_partition_layout_invariant(spark):
    """The DECIMAL-exact-sum claim, falsifiably: reshuffling the
    feature table cannot change a single bit of the learned weights
    (double sums would drift with partition-dependent order)."""
    feats = clf.featurize_hashed(_docs_df(spark))
    labels = _labels_df(spark)
    w1 = {
        r["bucket"]: r["w"]
        for r in clf.fit_linear_classifier(feats, labels).collect()
    }
    w2 = {
        r["bucket"]: r["w"]
        for r in clf.fit_linear_classifier(
            feats.repartition(7), labels.repartition(3)
        ).collect()
    }
    assert w1 == w2  # exact equality, not approx


def test_zero_token_doc_scores_via_bias(spark):
    feats = clf.featurize_hashed(_docs_df(spark))
    w = clf.fit_linear_classifier(feats, _labels_df(spark))
    scored = clf.classifier_score(feats, w)
    assert scored.count() == len(DOCS)  # doc 11 ("") still present
    s11 = scored.filter(F.col("doc_id") == 11).collect()[0]["score"]
    assert 0.0 < s11 < 1.0


def test_score_plan_broadcasts_weights(spark):
    feats = clf.featurize_hashed(_docs_df(spark))
    w = clf.fit_linear_classifier(feats, _labels_df(spark), iters=1)
    plan = formatted_plan(clf.classifier_score(feats, w))
    assert broadcast_join_count(clf.classifier_score(feats, w)) >= 1
    assert "CartesianProduct" not in plan


def test_oracle_generator_replays_fit_in_duckdb(spark):
    """The unrolled-CTE twin is the SAME fit: DuckDB on the same rows
    produces the same rounded scores the Spark loop does."""
    con = duckdb.connect()
    pdf = pd.DataFrame(
        [(i, t, len(t)) for i, t, _ in DOCS],
        columns=["doc_id", "text", "n_chars"],
    )
    con.register("docs_src", pdf)
    con.execute("CREATE TABLE documents AS SELECT * FROM docs_src")
    label_expr = "CASE WHEN n_chars >= 15 THEN 1.0 ELSE 0.0 END"
    sql = clf.classifier_scores_oracle_sql(
        iters=3, lr=2.0, label_expr=label_expr
    )
    want = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    docs = _docs_df(spark)
    feats = clf.featurize_hashed(docs)
    labels = docs.select(
        "doc_id",
        F.when(F.length("text") >= 15, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
    )
    w = clf.fit_linear_classifier(feats, labels, iters=3, lr=2.0)
    got = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score(feats, w).collect()
    }
    assert set(got) == set(want)
    for did in want:  # oracle rounds to 6dp; scores are bit-identical
        assert abs(got[did] - want[did]) < 5e-7, (did, got[did], want[did])


def test_store_probe_matches_in_memory_fit(spark, tmp_path):
    """save_classifier → classifier_score_against_index reproduces the
    in-memory fit-then-score EXACTLY (same weights, same decimal
    arithmetic) — the persisted-index contract every store family
    pins."""
    docs, labels = _docs_df(spark), _labels_df(spark)
    path = str(tmp_path / "clf_store")
    clf.save_classifier(docs, labels, path)
    feats = clf.featurize_hashed(docs)
    w = clf.fit_linear_classifier(feats, labels)
    want = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score(feats, w).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score_against_index(
            spark, path, docs
        ).collect()
    }
    assert got == want  # bit-equal, not approx


def test_score_expr_matches_batch_path(spark, tmp_path):
    """The row-local array-literal scoring expression (the streaming /
    serving variant) agrees with the batch broadcast-join path to
    float-order tolerance, scores every row including zero-token
    docs, and plans as a pure projection — zero exchanges."""
    from sensor_data_pipeline___spark.plans.explain import exchange_count

    docs, labels = _docs_df(spark), _labels_df(spark)
    path = str(tmp_path / "clf_store_expr")
    clf.save_classifier(docs, labels, path)
    want = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score_against_index(
            spark, path, docs
        ).collect()
    }
    scored = docs.select(
        "doc_id", clf.classifier_score_expr(spark, path).alias("score")
    )
    assert exchange_count(scored) == 0
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert set(got) == set(want)
    for did in want:
        assert abs(got[did] - want[did]) < 1e-9, (did, got[did], want[did])


def test_bigram_features_separate_order_swapped_docs(spark, tmp_path):
    """Docs with IDENTICAL unigram bags but different word order are
    inseparable for the unigram featurizer and separable with
    bigrams=True; the store records the flag so both probe paths
    (batch index probe and the row-local expression) replay it
    automatically and agree."""
    rows = []
    for i in range(6):
        rows.append((2 * i, f"good stuff filler{i}", 1.0))
        rows.append((2 * i + 1, f"stuff good filler{i}", 0.0))
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], "doc_id long, label double"
    )
    lab = {d: y for d, _, y in rows}

    def split_scores(feats):
        w = clf.fit_linear_classifier(feats, labels)
        sc = {
            r["doc_id"]: r["score"]
            for r in clf.classifier_score(feats, w).collect()
        }
        pos = [s for d, s in sc.items() if lab[d] == 1.0]
        neg = [s for d, s in sc.items() if lab[d] == 0.0]
        return min(pos), max(neg)

    # unigram bags identical -> scores identical within each pair
    mn1, mx0 = split_scores(clf.featurize_hashed(docs))
    assert mn1 <= mx0  # cannot separate
    mn1b, mx0b = split_scores(clf.featurize_hashed(docs, bigrams=True))
    assert mx0b < mn1b  # bigram order signal separates

    path = str(tmp_path / "clf_bigram_store")
    clf.save_classifier(docs, labels, path, bigrams=True)
    want = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score_against_index(
            spark, path, docs
        ).collect()
    }
    pos = [s for d, s in want.items() if lab[d] == 1.0]
    neg = [s for d, s in want.items() if lab[d] == 0.0]
    assert max(neg) < min(pos)  # the stored flag was replayed
    got = {
        r["doc_id"]: r["score"]
        for r in docs.select(
            "doc_id",
            clf.classifier_score_expr(spark, path).alias("score"),
        ).collect()
    }
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9


def test_xxhash_kind_self_consistent_and_distinct(spark, tmp_path):
    """hash_kind="xxhash64" (the r13 streaming-gate perf knob, ~1.6x
    faster per-token than md5 on the scoring fold): the store records
    the kind in meta, BOTH probe paths replay it (batch index probe
    bit-equal to an in-memory xx fit; the row-local expression within
    float-order tolerance and still zero exchanges), and the model
    still learns — while an md5-fit store yields different bucket
    assignments (the kinds are genuinely different hash spaces, so a
    mismatch would be a real bug the meta exists to prevent)."""
    from sensor_data_pipeline___spark.plans.explain import exchange_count

    docs, labels = _docs_df(spark), _labels_df(spark)
    path = str(tmp_path / "clf_store_xx")
    clf.save_classifier(docs, labels, path, hash_kind="xxhash64")

    feats = clf.featurize_hashed(docs, hash_kind="xxhash64")
    w = clf.fit_linear_classifier(feats, labels)
    want = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score(feats, w).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in clf.classifier_score_against_index(
            spark, path, docs
        ).collect()
    }
    assert got == want  # bit-equal: the store replays hash_kind

    scored = docs.select(
        "doc_id", clf.classifier_score_expr(spark, path).alias("score")
    )
    assert exchange_count(scored) == 0
    expr_scores = {r["doc_id"]: r["score"] for r in scored.collect()}
    for did in want:
        assert abs(expr_scores[did] - want[did]) < 1e-9

    # different hash space than md5 (bucket assignment differs)
    md5_feats = clf.featurize_hashed(docs)
    xx_set = {
        (r["doc_id"], r["bucket"]) for r in feats.collect()
    }
    md5_set = {
        (r["doc_id"], r["bucket"]) for r in md5_feats.collect()
    }
    assert xx_set != md5_set

    # rejects unknown kinds loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        clf.featurize_hashed(docs, hash_kind="sha1").collect()
