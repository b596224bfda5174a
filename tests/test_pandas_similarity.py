"""The Arrow/numpy cosine path must agree with the JVM column-expression
path at the rounded precision both emit."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators.similarity import (
    brute_force_topk,
    pandas_cosine_scores,
)
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_pandas_path_matches_jvm_path(spark):
    emb = readers.table(spark, "embeddings", SF)
    queries = emb.filter(F.col("vec_id") < 4)
    qvecs = [
        (r["vec_id"], [float(x) for x in r["embedding"]]) for r in queries.collect()
    ]

    jvm = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in brute_force_topk(queries, emb, k=10_000).collect()
    }
    arrow = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in pandas_cosine_scores(emb, qvecs)
        .filter(F.col("query_id") != F.col("vec_id"))
        .collect()
    }
    assert set(jvm) == set(arrow)
    worst = max(abs(jvm[k] - arrow[k]) for k in jvm)
    # both sides round to 6 digits; BLAS reassociation can flip the last
    # rounded digit on exact .5 boundaries — allow one ulp of the rounding
    assert worst <= 1e-6, worst
