"""DSIR importance resampling (operators/dsir.py): weights match a
pure-Python reference exactly, selection is deterministic Gumbel-top-k,
and the plan keeps both distribution joins broadcast."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import dsir
from sensor_data_pipeline___spark.plans import explain
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


def _py_bucket(s: str, salt: str, n_buckets: int = dsir.N_BUCKETS) -> int:
    h = hashlib.md5(f"{salt}|{s}".encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


def _py_grams(text: str) -> list[str]:
    t = text.split(" ")
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def test_log_weights_match_python_reference(spark):
    """End-to-end weight parity on a real corpus slice: tokenization,
    bucket hashing, add-1 smoothing, and the factored normalizer
    constant all agree with an independent reference implementation to
    float tolerance."""
    docs = readers.table(spark, "documents", SF).filter(
        F.col("doc_id") < 120
    )
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    grams = {}
    for did, text, lang in rows:
        bs = [_py_bucket(g, "dsir-v1") for g in _py_grams(text)]
        grams[did] = bs
        for b in bs:
            rcnt[b] = rcnt.get(b, 0) + 1
            if lang == "en":
                tcnt[b] = tcnt.get(b, 0) + 1
    tt, tr = sum(tcnt.values()), sum(rcnt.values())
    const = math.log((tr + dsir.N_BUCKETS) / (tt + dsir.N_BUCKETS))
    want = {
        did: sum(
            math.log((tcnt.get(b, 0) + 1.0) / (rcnt[b] + 1.0)) for b in bs
        )
        + len(bs) * const
        for did, bs in grams.items()
    }

    got = {
        r.doc_id: (r.log_weight, r.n_grams)
        for r in dsir.dsir_log_weights(
            docs, docs.filter(F.col("lang") == "en")
        ).collect()
    }
    assert set(got) == set(want)
    for did, (lw, ng) in got.items():
        assert ng == len(grams[did])
        assert abs(lw - want[did]) < 1e-9, (did, lw, want[did])


def test_weights_separate_target_from_offtarget(spark):
    """The whole point: documents from the target language score
    higher than off-target ones against an English target."""
    docs = readers.table(spark, "documents", SF)
    w = dsir.dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en")
    ).join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in w.groupBy("lang")
        .agg(F.avg(F.col("log_weight") / F.col("n_grams")).alias("m"))
        .collect()
    }
    assert all(means["en"] > m for lang, m in means.items() if lang != "en")


def test_resample_is_deterministic_gumbel_topk(spark):
    """dsir_resample == add hash-Gumbel noise to the weights, take the
    k largest keys; repeat runs identical; a different noise salt
    redraws the sample."""
    docs = readers.table(spark, "documents", SF)
    target = docs.filter(F.col("lang") == "en")
    w = {
        r.doc_id: r.log_weight
        for r in dsir.dsir_log_weights(docs, target).collect()
    }

    def key(did: int, salt: str = "dsir-gumbel-v1") -> float:
        h = hashlib.md5(f"{salt}|{did}".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 2**32
        return w[did] - math.log(-math.log(u))

    want = sorted(w, key=lambda d: (-key(d), d))[:50]
    got = [r.doc_id for r in dsir.dsir_resample(docs, target, k=50).collect()]
    assert got == want
    assert got == [
        r.doc_id for r in dsir.dsir_resample(docs, target, k=50).collect()
    ]
    redrawn = [
        r.doc_id
        for r in dsir.dsir_resample(
            docs, target, k=50, noise_salt="v2"
        ).collect()
    ]
    assert redrawn == sorted(w, key=lambda d: (-key(d, "v2"), d))[:50]
    assert redrawn != got  # a new salt actually redraws


def test_dsir_plan_broadcasts_distributions_no_global_sort(spark):
    """Scale shape: the two bucket-count joins and the two 1-row totals
    are all broadcast (no sort-merge join anywhere — nothing shuffles
    on bucket), and the top-k is TakeOrdered, not a global Sort+limit.
    The only hash exchanges are the groupBys (bucket counts + per-doc
    sum), all partial-aggregated."""
    docs = readers.table(spark, "documents", SF)
    sel = dsir.dsir_resample(docs, docs.filter(F.col("lang") == "en"), k=25)
    plan = explain.formatted_plan(sel)
    assert explain.sort_merge_join_count(sel) == 0, plan
    assert explain.broadcast_join_count(sel) >= 3, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial" in plan.lower(), plan
