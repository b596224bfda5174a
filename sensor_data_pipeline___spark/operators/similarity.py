"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: a broadcast of the
(small) query set against the full corpus — one narrow pass over the
corpus, no shuffle except the final per-query top-k. The scale path is
LSH bucketing (random-hyperplane signs), which turns the cross product
into an equi-join on bucket ids.

All arithmetic is JVM-side (``zip_with`` / ``aggregate`` fold over the
array in index order, double precision) — deterministic and bit-stable,
which the DuckDB oracle comparison relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, rank per query.

    Similarity is rounded BEFORE ranking so ties break identically
    across engines (tiebreak: corpus id ascending). Returns
    (query_id, vec_id, cosine, rnk).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qe")
    )
    c = corpus.select(F.col(id_col), _to_double(F.col(vec_col)).alias("ce"))
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qe"), F.col("ce")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cosine", "rnk")
    )


def near_dup_pairs(
    emb: DataFrame,
    block_col: str,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocks.

    The block key bounds the pair space (here a provided column; at
    scale an LSH bucket id from :func:`lsh_bucket`). Self equi-join on
    the block — never a cross join."""
    v = emb.select(
        F.col(id_col), F.col(block_col).alias("_blk"), _to_double(F.col(vec_col)).alias("e")
    )
    a, b = v.alias("a"), v.alias("b")
    cos = cosine(F.col("a.e"), F.col("b.e"))
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(cos > threshold)
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(cos, round_digits).alias("cosine"),
        )
    )


def lsh_bucket(
    emb: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of ``num_planes``
    projections). Deterministic: plane coefficients derive from
    xxhash64(seed, plane, dim-index) mapped to [-1, 1].

    Buckets serve as the blocking key for approximate near-dup /
    top-k at corpus scales where brute force is infeasible."""
    projections = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.aggregate(
            F.zip_with(
                _to_double(F.col(vec_col)),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    # hash → [-1, 1): bucket-assignment only needs sign
                    # agreement across rows, not real gaussians
                    lambda i: (
                        F.pmod(F.xxhash64(F.lit(seed), p, i), F.lit(2_000_001)) / 1_000_000.0
                        - 1.0
                    ),
                ),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    ).alias("_proj")
    with_proj = emb.withColumn("_proj", projections)
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket.bitwiseOR(
            F.when(F.col("_proj")[p] > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return with_proj.withColumn("lsh_bucket", bucket).drop("_proj")
