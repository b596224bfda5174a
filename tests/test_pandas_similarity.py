"""The Arrow/numpy cosine path must agree with the JVM column-expression
path at the rounded precision both emit."""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

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


def test_ivf_topk_exact_when_probing_all_cells(spark):
    """nprobe == ncells must reduce IVF to exact brute force (same
    rounding + tiebreak) — the graceful-degradation contract."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", "/root/testdata/sf0.001")
    # content-deterministic query set (bare limit follows partition
    # layout, which the reader's parallelism floor can change)
    q = emb.orderBy("vec_id").limit(8)
    cents = sim.ivf_centroids(emb, ncells=8, iters=0)
    exact = sorted(map(tuple, sim.ivf_topk(q, emb, cents, k=5, nprobe=8).collect()))
    bf = sorted(map(tuple, sim.brute_force_topk(q, emb, k=5).collect()))
    assert exact == bf


def test_ivf_assign_partitions_corpus(spark):
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", "/root/testdata/sf0.001")
    cents = sim.ivf_centroids(emb, ncells=8, iters=1)
    asg = sim.ivf_assign(emb, cents)
    assert asg.count() == emb.count() == asg.select("vec_id").distinct().count()
    assert asg.select("cell").distinct().count() == 8


def test_ivf_recall_with_probing(spark):
    """Probing 2/8 cells after one Lloyd refinement keeps most true
    neighbors (deterministic corpus → the measured recall is stable)."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", "/root/testdata/sf0.001")
    # orderBy before limit: a bare limit() picks whatever rows arrive
    # first, which changes with the reader's partition layout — the
    # query set must be content-deterministic for a stable recall
    q = emb.orderBy("vec_id").limit(8)
    cents = sim.ivf_centroids(emb, ncells=8, iters=1)
    approx = sim.ivf_topk(q, emb, cents, k=5, nprobe=2)
    ap = {(r.query_id, r.vec_id) for r in approx.collect()}
    bf = {(r.query_id, r.vec_id) for r in sim.brute_force_topk(q, emb, k=5).collect()}
    assert len(ap & bf) / len(bf) >= 0.5


def test_ivf_index_roundtrip_matches_inmemory(spark, tmp_path):
    """The persisted index (save_ivf_index → ivf_topk_indexed) must
    return row-identical results to the in-memory ivf_topk over the
    same centroids, and the probe scan must prune to the probed cells'
    partitions (PartitionFilters on cell)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
        ivf_topk_indexed,
        save_ivf_index,
    )
    from sensor_data_pipeline___spark.plans import explain

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")
    save_ivf_index(corpus, path, ncells=8, iters=1)

    cents = ivf_centroids(corpus, ncells=8, iters=1)
    expected = sorted(
        map(tuple, ivf_topk(queries, corpus, cents, k=5, nprobe=3).collect())
    )
    got_df = ivf_topk_indexed(spark, path, queries, k=5, nprobe=3)
    got = sorted(map(tuple, got_df.collect()))
    assert got == expected
    assert len(got) > 0

    plan = explain.formatted_plan(got_df)
    assert "PartitionFilters" in plan and "cell" in plan, plan


def test_quantized_search_recall(spark):
    """int8 quantization must preserve neighborhood structure: top-10
    by cosine over the DEQUANTIZED corpus recovers nearly all of the
    exact top-10 (max-abs int8 at 64 dims is a ~0.4% per-component
    perturbation — far below typical neighbor gaps)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.similarity import (
        brute_force_topk,
        quantize_embeddings,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 10)
    deq = quantize_embeddings(corpus).select(
        "vec_id",
        F.zip_with(
            F.col("qvec"),
            F.array_repeat(F.col("scale"), F.size("qvec")),
            lambda q, s: q.cast("double") * s,
        ).alias("embedding"),
    )
    exact = brute_force_topk(queries, corpus, k=10)
    approx = brute_force_topk(queries, deq, k=10)

    def neighbors(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    ex, ap = neighbors(exact), neighbors(approx)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_quantized_ivf_index_recall(spark, tmp_path):
    """A quantize=True index must search transparently (dequantized
    codes) with near-total agreement with the full-precision index,
    and still prune the probe scan by cell partition."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.similarity import (
        ivf_topk_indexed,
        save_ivf_index,
    )
    from sensor_data_pipeline___spark.plans import explain

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 10)
    full_p, quant_p = str(tmp_path / "full"), str(tmp_path / "quant")
    save_ivf_index(corpus, full_p, ncells=8, iters=1)
    save_ivf_index(corpus, quant_p, ncells=8, iters=1, quantize=True)

    def neighbors(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    full = neighbors(ivf_topk_indexed(spark, full_p, queries, k=10, nprobe=3))
    qdf = ivf_topk_indexed(spark, quant_p, queries, k=10, nprobe=3)
    quant = neighbors(qdf)
    recalls = [len(full[q] & quant[q]) / len(full[q]) for q in full]
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    plan = explain.formatted_plan(qdf)
    assert "PartitionFilters" in plan and "cell" in plan, plan


def test_hard_negatives_ivf_exact_when_probing_all_cells(spark):
    """nprobe == ncells must reduce blocked mining to the brute-force
    twin bit-for-bit (same rounding + id tiebreak) — the same
    graceful-degradation contract ivf_topk pins (VERDICT r5 #2)."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.filter(F.col("vec_id") < 8)
    cents = sim.ivf_centroids(emb, ncells=8, iters=1)
    blocked = sorted(
        map(
            tuple,
            sim.hard_negatives_ivf(
                anchors, emb, cents, k=5, nprobe=8
            ).collect(),
        )
    )
    brute = sorted(
        map(tuple, sim.hard_negatives(anchors, emb, k=5).collect())
    )
    assert blocked == brute and len(blocked) > 0


def test_hard_negatives_ivf_recall_with_probing(spark):
    """Probing 2/8 cells keeps most true hard negatives: hard
    negatives are by construction high-cosine (near-boundary) vectors,
    the exact mass IVF probing retains."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.orderBy("vec_id").limit(8)
    cents = sim.ivf_centroids(emb, ncells=8, iters=1)
    ap = {
        (r.query_id, r.vec_id)
        for r in sim.hard_negatives_ivf(
            anchors, emb, cents, k=5, nprobe=2
        ).collect()
    }
    bf = {
        (r.query_id, r.vec_id)
        for r in sim.hard_negatives(anchors, emb, k=5).collect()
    }
    assert len(ap & bf) / len(bf) >= 0.5


def test_hard_negatives_ivf_plan_has_no_cross_join(spark):
    """The mining join must be a hash join on the cell id — never a
    cartesian/nested-loop product of corpus × anchors. The only
    nested-loop joins allowed in the plan are the bounded
    row × broadcast(centroids) probe shapes (ncells-wide, the
    documented ivf_assign/_ivf_probes pattern)."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.plans import explain
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.filter(F.col("vec_id") < 8)
    cents = sim.ivf_centroids(emb, ncells=8, iters=0)
    plan = explain.formatted_plan(
        sim.hard_negatives_ivf(anchors, emb, cents, k=5, nprobe=2)
    )
    assert "CartesianProduct" not in plan, plan
    # corpus reaches anchors through an equi hash join keyed on cell
    assert "BroadcastHashJoin" in plan and "cell" in plan, plan


def test_quantized_recall_isolated_at_full_probe(spark, tmp_path):
    """VERDICT r5 directive #7: at nprobe == ncells the IVF path is
    exhaustive, so the ONLY error source left in a quantize=True index
    is int8 quantization itself. Pin recall@5 vs exact brute force at
    a stated floor (0.9; measured 1.0 on this corpus — the scale/2
    per-component bound, see quantize_embeddings' docstring, gives a
    worst-case cosine perturbation ~sqrt(dim)/254 ≈ 3% at 64 dims,
    well under typical neighbor gaps)."""
    from sensor_data_pipeline___spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_indexed,
        save_ivf_index,
    )

    corpus = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "quant")
    save_ivf_index(corpus, path, ncells=8, iters=1, quantize=True)

    def neighbors(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    exact = neighbors(brute_force_topk(queries, corpus, k=5))
    quant = neighbors(
        ivf_topk_indexed(spark, path, queries, k=5, nprobe=8)
    )
    recalls = [len(exact[q] & quant[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_hard_negatives_ivf_indexed_exact_on_saved_index(spark, tmp_path):
    """VERDICT r6 directive #2: mining against the PERSISTED index at
    nprobe == ncells must be bit-identical to the brute-force twin
    (same rounding + id tiebreak), and the store must carry the label
    via extra_cols so no corpus join is needed."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, path, ncells=8, iters=1, extra_cols=("label",))
    indexed = sorted(
        map(
            tuple,
            sim.hard_negatives_ivf_indexed(
                spark, path, anchors, k=5, nprobe=8
            ).collect(),
        )
    )
    brute = sorted(
        map(tuple, sim.hard_negatives(anchors, emb, k=5).collect())
    )
    assert indexed == brute and len(indexed) > 0


def test_hard_negatives_ivf_indexed_prunes_partitions(spark, tmp_path):
    """The probed cells must reach the store scan as PARTITION filters
    (file pruning) and the mining join must stay cross-join-free —
    mining cost tracks the probe mass, not the corpus."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.plans import explain
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.filter(F.col("vec_id") < 4)
    path = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, path, ncells=8, iters=1, extra_cols=("label",))
    out = sim.hard_negatives_ivf_indexed(spark, path, anchors, k=5, nprobe=2)
    plan = explain.formatted_plan(out)
    assert "PartitionFilters" in plan and "cell" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # and results agree with the in-memory blocked miner on the same
    # centroids (the store holds exactly those centroids)
    cents = spark.read.parquet(path + "/centroids")
    mem = sorted(
        map(
            tuple,
            sim.hard_negatives_ivf(
                anchors, emb, cents, k=5, nprobe=2
            ).collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == mem


def test_hard_negatives_ivf_indexed_quantized_store(spark, tmp_path):
    """Mining on an int8 store dequantizes transparently (matching
    search): at full probe, pair overlap with exact mining stays high
    and cosine error is within the scale/2-per-component bound."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    anchors = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivf8")
    sim.save_ivf_index(
        emb, path, ncells=8, iters=1, quantize=True, extra_cols=("label",)
    )
    got = sim.hard_negatives_ivf_indexed(
        spark, path, anchors, k=5, nprobe=8
    ).collect()
    exact = sim.hard_negatives(anchors, emb, k=5).collect()
    gp = {(r.query_id, r.vec_id) for r in got}
    ep = {(r.query_id, r.vec_id) for r in exact}
    assert len(gp & ep) / len(ep) >= 0.8
    # labels on surviving pairs are mismatched
    assert all(r.negative_label is not None for r in got)


def test_lsh_topk_exact_when_probing_full_hamming_ball(spark):
    """probe_hamming == num_planes spans every bucket, so multi-probe
    LSH must reduce to brute force bit-for-bit (same rounding + id
    tiebreak) — the contract that makes ann_topk_lsh_exact
    oracle-verifiable."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 8)
    exact = sorted(
        map(
            tuple,
            sim.lsh_topk(q, emb, k=5, num_planes=6, probe_hamming=6).collect(),
        )
    )
    bf = sorted(map(tuple, sim.brute_force_topk(q, emb, k=5).collect()))
    assert exact == bf and len(exact) > 0


def test_lsh_topk_multiprobe_recall_monotone(spark):
    """Widening the Hamming ball can only add probed buckets, so
    recall@5 vs brute force is monotone in probe_hamming — and probing
    1 bit already recovers a solid share of the true neighbours."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    q = emb.filter(F.col("vec_id") < 8)
    bf = {
        (r.query_id, r.vec_id)
        for r in sim.brute_force_topk(q, emb, k=5).collect()
    }
    recalls = []
    for h in (0, 1, 2):
        got = {
            (r.query_id, r.vec_id)
            for r in sim.lsh_topk(
                q, emb, k=5, num_planes=6, probe_hamming=h
            ).collect()
        }
        recalls.append(len(got & bf) / len(bf))
    assert recalls[0] <= recalls[1] <= recalls[2]
    # the sf0.001 embeddings are near-orthogonal random vectors (the
    # hardest case for hyperplane LSH — sign patterns are ~independent
    # coin flips), so the useful floor sits at radius 2: measured
    # 0.075 / 0.15 / 0.55 at h = 0 / 1 / 2
    assert recalls[2] >= 0.4, recalls


def test_blocked_mining_recall_floor_on_distinct_corpus(spark):
    """VERDICT r6 directive #4: recall measured on a corpus of DISTINCT
    vectors (seeded mixture, no replicas), where id-recall@k is a clean
    metric — the 400k replica study's 0.38 id-recall was an artifact of
    ~200 near-equal copies per negative. On the mixture corpus, probing
    2/8 cells must keep at least half of the true hard negatives
    (measured 0.64 at 20k vectors, scripts/mine_scale_check.py)."""
    from sensor_data_pipeline___spark.operators import similarity as sim

    corpus = sim.synthetic_mixture_corpus(
        spark, 4000, n_labels=8, sigma=0.3
    ).cache()
    anchors = corpus.filter(F.col("vec_id") < 64)
    cents = sim.ivf_centroids(corpus, ncells=8, iters=1)
    blocked = {
        (r.query_id, r.vec_id)
        for r in sim.hard_negatives_ivf(
            anchors, corpus, cents, k=5, nprobe=2
        ).collect()
    }
    brute = {
        (r.query_id, r.vec_id)
        for r in sim.hard_negatives(anchors, corpus, k=5).collect()
    }
    assert len(blocked & brute) / len(brute) >= 0.5


def test_ivf_index_append_matches_rebuild(spark, tmp_path):
    """Appending a batch to a saved index must yield search results
    IDENTICAL to rebuilding the store from the full corpus with the
    same centroids — assignment is against the stored centroids, so
    append is pure layout, not semantics. Existing files stay
    untouched (append, not rewrite)."""
    import glob

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    inc_p = str(tmp_path / "inc")
    sim.save_ivf_index(old, inc_p, ncells=8, iters=1)
    before = set(glob.glob(inc_p + "/vectors/*/*/*.parquet"))
    sim.ivf_index_append(spark, inc_p, new)
    after = set(glob.glob(inc_p + "/vectors/*/*/*.parquet"))
    assert before <= after and len(after) > len(before)

    # rebuild twin: same centroids (assign full corpus), fresh store
    full_p = str(tmp_path / "full")
    cents = spark.read.parquet(inc_p + "/centroids")
    assigned = sim.ivf_assign(emb, cents)
    (
        emb.select("vec_id", "embedding")
        .join(assigned, "vec_id")
        .repartition("cell")
        .write.partitionBy("cell")
        .parquet(full_p + "/vectors")
    )
    cents.write.parquet(full_p + "/centroids")

    got = sorted(map(tuple, sim.ivf_topk_indexed(
        spark, inc_p, queries, k=5, nprobe=8
    ).collect()))
    want = sorted(map(tuple, sim.ivf_topk_indexed(
        spark, full_p, queries, k=5, nprobe=8
    ).collect()))
    assert got == want and len(got) > 0


def test_ivf_index_append_quantized_store_matches_flavor(spark, tmp_path):
    """Appending to an int8 store must append int8 codes (schema
    detected from the store), and searches over the appended store
    must include appended vectors."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    p = str(tmp_path / "q")
    sim.save_ivf_index(old, p, ncells=8, iters=1, quantize=True)
    sim.ivf_index_append(spark, p, new)
    vecs = spark.read.parquet(p + "/vectors")
    assert "qvec" in vecs.columns and "scale" in vecs.columns
    assert vecs.count() == emb.count()
    # an appended vector is findable: query for itself at full probe
    q = emb.filter(F.col("vec_id") == 7)
    got = sim.ivf_topk_indexed(spark, p, q, k=3, nprobe=8).collect()
    assert len(got) == 3  # neighbors exist and search runs end-to-end


def test_ivf_index_stats_balance(spark, tmp_path):
    """Per-cell stats: shares sum to 1, balance is share x ncells, and
    every stored cell is present."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, p, ncells=8, iters=1)
    stats = sim.ivf_index_stats(spark, p).collect()
    assert len(stats) == 8
    assert abs(sum(r["share"] for r in stats) - 1.0) < 1e-4
    assert sum(r["n_vectors"] for r in stats) == emb.count()
    for r in stats:
        assert r["balance"] == pytest.approx(r["share"] * 8, abs=1e-3)
        assert r["n_files"] >= 1


def test_ivf_index_append_rejects_extra_col_mismatch(spark, tmp_path):
    """Appending without the store's metadata columns must raise, not
    write files with a diverging schema (parquet inference samples one
    footer — a silent-corruption class)."""
    import pytest as _pytest

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, p, ncells=4, iters=0, extra_cols=("label",))
    with _pytest.raises(ValueError, match="extra columns"):
        sim.ivf_index_append(spark, p, emb.limit(5))
    # matching extra_cols appends fine
    sim.ivf_index_append(
        spark, p,
        emb.limit(5).withColumn("vec_id", F.col("vec_id") + 10_000),
        extra_cols=("label",),
    )


def test_lsh_topk_caps_probe_explosion():
    """probe mask enumeration is a literal plan array — a runaway
    Hamming ball must raise with guidance, not build a 65k-element
    plan."""
    import pytest as _pytest

    from sensor_data_pipeline___spark.operators import similarity as sim

    with _pytest.raises(ValueError, match="probe buckets"):
        sim.lsh_topk(None, None, num_planes=16, probe_hamming=16)


def test_hard_negatives_ivf_indexed_requires_stored_label(spark, tmp_path):
    """Mining against a store saved WITHOUT the label column must fail
    fast with the fix spelled out, not with a raw unresolved-column
    analysis error deep in the plan."""
    import pytest as _pytest

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "nolabel")
    sim.save_ivf_index(emb, p, ncells=4, iters=0)  # no extra_cols
    with _pytest.raises(ValueError, match="extra_cols"):
        sim.hard_negatives_ivf_indexed(spark, p, emb.limit(4))


def test_ivf_index_append_replay_is_effectively_once(spark, tmp_path):
    """With a replay-stable ingest_key, re-running the same append
    (crash between append and checkpoint commit) replaces its own
    partitions — vector count and search results unchanged."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    old = emb.filter(F.col("vec_id") >= 100)
    new = emb.filter(F.col("vec_id") < 100)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(old, p, ncells=8, iters=1)
    sim.ivf_index_append(spark, p, new, ingest_key="b3")
    sim.ivf_index_append(spark, p, new, ingest_key="b3")  # replay
    vecs = spark.read.parquet(p + "/vectors")
    assert vecs.count() == emb.count()
    assert vecs.select("vec_id").distinct().count() == emb.count()
    q = emb.filter(F.col("vec_id") < 3)
    got = sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=8)
    assert got.count() == 15  # 3 queries x k, no duplicate candidates


def test_ivf_index_stats_balance_uses_trained_ncells(spark, tmp_path):
    """ADVICE r7: balance must be share × TRAINED ncells (centroids
    table), not share × populated-cell count — with empty cells the
    two diverge exactly when the retrain signal matters. Drift is
    simulated by emptying one cell's partition (all its members
    superseded); the remaining cells' balance must still read
    share × trained-ncells."""
    import shutil

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, p, ncells=8, iters=1)
    ncells_trained = spark.read.parquet(p + "/centroids").count()
    assert ncells_trained == 8
    victim = spark.read.parquet(p + "/vectors").select("cell").first()[0]
    shutil.rmtree(str(tmp_path / "ivf" / "vectors" / f"cell={victim}"))

    stats = sim.ivf_index_stats(spark, p).collect()
    assert len(stats) < ncells_trained  # the drift scenario is real
    for r in stats:
        assert r["balance"] == pytest.approx(
            r["share"] * ncells_trained, abs=1e-3
        )


def test_ivf_retrain_matches_scratch_build_and_swaps_atomically(
    spark, tmp_path
):
    """VERDICT r7 directive #5: retraining an (undrifted) store with
    the same seed/iters must serve searches identical to a
    from-scratch save_ivf_index on the same data, via the versioned
    root + CURRENT pointer — and the old version stays on disk
    (readers mid-query keep the version they resolved)."""
    import os

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(emb, p, ncells=8, iters=1)
    q = emb.filter(F.col("vec_id") < 6)
    before = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=3).collect())
    )

    new_root = sim.ivf_retrain(spark, p, iters=1)
    assert os.path.basename(new_root) == "v1"
    assert open(os.path.join(p, "CURRENT")).read() == "v1"
    assert os.path.isdir(os.path.join(p, "vectors"))  # v0 untouched

    after = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=3).collect())
    )
    assert after == before

    p2 = str(tmp_path / "scratch")
    sim.save_ivf_index(emb, p2, ncells=8, iters=1)
    scratch = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p2, q, k=5, nprobe=3).collect())
    )
    assert after == scratch

    # a second retrain advances the version chain
    assert os.path.basename(sim.ivf_retrain(spark, p)) == "v2"
    assert open(os.path.join(p, "CURRENT")).read() == "v2"


def test_ivf_retrain_improves_balance_on_drifted_store(spark, tmp_path):
    """The retrain trigger closed: centroids trained on one region of
    the space, then an append of mass from elsewhere — balance
    degrades (hot cells); retraining from the store restores it."""
    from sensor_data_pipeline___spark.operators import similarity as sim

    base = sim.synthetic_mixture_corpus(spark, 2_000, n_labels=4, seed=1)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(base.drop("label"), p, ncells=8, iters=1)

    drift = (
        sim.synthetic_mixture_corpus(spark, 4_000, n_labels=4, seed=99)
        .drop("label")
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    sim.ivf_index_append(spark, p, drift)
    worst_before = max(
        r["balance"] for r in sim.ivf_index_stats(spark, p).collect()
    )
    sim.ivf_retrain(spark, p, iters=1)
    worst_after = max(
        r["balance"] for r in sim.ivf_index_stats(spark, p).collect()
    )
    assert worst_after < worst_before
    # row conservation: retrain moves vectors between cells, never
    # drops or duplicates them
    stats = sim.ivf_index_stats(spark, p).collect()
    assert sum(r["n_vectors"] for r in stats) == 6_000


def test_ivf_retrain_quantized_store_and_replay_keys_carry_over(
    spark, tmp_path
):
    """Quantized stores retrain transparently (int8 codes survive
    byte-identical; training reads the dequantized vectors), ingest
    keys carry into the new version, and an append replayed AFTER the
    retrain still lands effectively-once in the new version."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(
        emb.filter(F.col("vec_id") < 400), p, ncells=4, iters=1,
        quantize=True,
    )
    late = emb.filter(F.col("vec_id") >= 400)
    sim.ivf_index_append(spark, p, late, ingest_key="b9")
    codes_before = {
        (r["vec_id"], tuple(r["qvec"]), r["scale"])
        for r in spark.read.parquet(p + "/vectors").collect()
    }
    sim.ivf_retrain(spark, p, iters=1)
    new_vecs = spark.read.parquet(p + "/v1/vectors")
    assert "qvec" in new_vecs.columns
    codes_after = {
        (r["vec_id"], tuple(r["qvec"]), r["scale"])
        for r in new_vecs.collect()
    }
    assert codes_after == codes_before
    assert sorted(
        r["ingest_key"]
        for r in new_vecs.select("ingest_key").distinct().collect()
    ) == ["b9", "base"]

    # crash-replay of the pre-retrain append, after the swap: replaces
    # its own key's rows in the CURRENT version, no duplicates
    sim.ivf_index_append(spark, p, late, ingest_key="b9")
    assert spark.read.parquet(p + "/v1/vectors").count() == len(codes_before)


def test_semantic_dedup_blocked_is_superset_of_exact_survivors(spark):
    """SemDeDup recall direction: clustering can only MISS cross-block
    pairs, so the blocked survivor set is always a superset of the
    exact (ncells=1) survivor set — and both keep the smallest id of
    every dropped pair."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    exact = {
        r.vec_id
        for r in sim.semantic_dedup(
            emb, threshold=0.45, ncells=1, iters=0
        ).select("vec_id").collect()
    }
    blocked = {
        r.vec_id
        for r in sim.semantic_dedup(
            emb, threshold=0.45, ncells=4, iters=1
        ).select("vec_id").collect()
    }
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert exact <= blocked <= all_ids
    assert len(exact) < len(all_ids)  # the drop set is non-degenerate


def test_ivf_fresh_save_over_retrained_store_not_shadowed(spark, tmp_path):
    """Review r8: save_ivf_index over a previously RETRAINED store
    must retire the stale CURRENT pointer — otherwise every reader
    keeps serving (and appends keep landing in) the old versioned
    root while the fresh flat store sits unused."""
    import os

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    corpus_a = emb.filter(F.col("vec_id") < 200)
    sim.save_ivf_index(corpus_a, p, ncells=4, iters=1)
    sim.ivf_retrain(spark, p)  # CURRENT -> v1

    corpus_b = emb.filter(F.col("vec_id") >= 200)
    sim.save_ivf_index(corpus_b, p, ncells=4, iters=1)
    assert not os.path.exists(os.path.join(p, "CURRENT"))

    q = corpus_b.filter(F.col("vec_id") < 210)
    got = sim.ivf_topk_indexed(spark, p, q, k=3, nprobe=4)
    ids = {r.vec_id for r in got.collect()}
    assert ids and all(i >= 200 for i in ids)  # serves corpus B, not A


def test_ivf_fresh_save_after_append_retires_appended_vectors(
    spark, tmp_path
):
    """Round-8 fix pin: a fresh save_ivf_index must STATIC-overwrite
    the whole vectors store — under the session's dynamic
    partition-overwrite default only the written (cell, 'base')
    partitions would be replaced, and an earlier append's ingest_key
    partitions would keep serving retired vectors in every search."""
    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    a = emb.filter(F.col("vec_id") < 100)
    b = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200))
    c = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300))

    p = str(tmp_path / "ivf")
    sim.save_ivf_index(a, p, ncells=4, iters=1)
    sim.ivf_index_append(spark, p, b, ingest_key="b1")
    sim.save_ivf_index(c, p, ncells=4, iters=1)  # fresh store

    q = emb.filter(F.col("vec_id") < 5)
    got = sim.ivf_topk_indexed(spark, p, q, k=3, nprobe=4)
    ids = {r.vec_id for r in got.collect()}
    assert ids and all(200 <= i < 300 for i in ids)


def test_ivf_index_compact_folds_batches_and_search_is_unchanged(
    spark, tmp_path
):
    """ivf_index_compact: per-batch ingest_key partitions fold into one
    'base' generation under a new version root; search results are
    row-identical pre/post (same centroids, same assignments, same
    codes) and the data-file count drops."""
    import glob
    import os

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(
        emb.filter(F.col("vec_id") < 150), p, ncells=4, iters=1
    )
    for i, lo in enumerate((150, 250, 350)):
        sim.ivf_index_append(
            spark, p,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)),
            ingest_key=f"b{i}",
        )
    q = emb.filter(F.col("vec_id") < 8)
    before = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=4).collect())
    )
    files = lambda root: glob.glob(
        os.path.join(root, "vectors", "**", "*.parquet"), recursive=True
    )
    n_before = len(files(sim._store_root(p)))

    new_root = sim.ivf_index_compact(spark, p)
    assert open(os.path.join(p, "CURRENT")).read().strip() == os.path.basename(
        new_root
    )
    after = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=4).collect())
    )
    assert after == before
    assert len(files(new_root)) < n_before
    # folded: exactly one ingest_key partition per populated cell
    keys = {
        os.path.basename(d)
        for d in glob.glob(os.path.join(new_root, "vectors", "*", "*"))
        if os.path.isdir(d)
    }
    assert keys == {"ingest_key=base"}

    # appends keep working against the compacted generation
    sim.ivf_index_append(
        spark, p, emb.filter(F.col("vec_id") >= 450), ingest_key="b9"
    )
    assert sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=4).count() == len(
        before
    )


def test_ivf_maintenance_policy_chooses_and_acts(spark, tmp_path):
    """ivf_maintenance is the decision layer over the lifecycle ops:
    healthy store -> none; many append keys, balanced -> compact
    (search row-identical); drifted balance -> retrain (worst balance
    improves), and retrain WINS over a simultaneously-due compaction
    (it folds too, so the expensive fix subsumes the cheap one)."""
    import os

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.sources import readers

    emb = readers.table(spark, "embeddings", SF)
    p = str(tmp_path / "ivf")
    sim.save_ivf_index(
        emb.filter(F.col("vec_id") < 200), p, ncells=4, iters=1
    )

    # fresh store: nothing due
    out = sim.ivf_maintenance(spark, p)
    assert out["action"] == "none" and out["new_root"] is None
    assert out["n_ingest_keys"] == 1

    # same-distribution appends under 3 keys: compaction due at
    # compact_after_keys=2, balance untouched -> compact, and the
    # compacted generation serves identical search results
    for i, lo in enumerate((200, 300, 400)):
        sim.ivf_index_append(
            spark, p,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)),
            ingest_key=f"b{i}",
        )
    q = emb.filter(F.col("vec_id") < 8)
    before = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=4).collect())
    )
    out = sim.ivf_maintenance(
        spark, p, retrain_balance=1e9, compact_after_keys=2
    )
    assert out["action"] == "compact"
    assert out["n_ingest_keys"] == 4
    assert open(os.path.join(p, "CURRENT")).read().strip() == os.path.basename(
        out["new_root"]
    )
    after = sorted(
        map(tuple, sim.ivf_topk_indexed(spark, p, q, k=5, nprobe=4).collect())
    )
    assert after == before
    # post-compaction tick: one key again, nothing due
    assert sim.ivf_maintenance(
        spark, p, retrain_balance=1e9, compact_after_keys=2
    )["action"] == "none"

    # drift the store: off-distribution mass under MANY keys -> both
    # triggers fire, retrain wins and restores balance
    drift = (
        sim.synthetic_mixture_corpus(spark, 2_000, n_labels=4, seed=99)
        .drop("label")
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    for i in range(3):
        sim.ivf_index_append(
            spark, p,
            drift.filter(F.pmod("vec_id", F.lit(3)) == i),
            ingest_key=f"d{i}",
        )
    worst_before = max(
        r["balance"] for r in sim.ivf_index_stats(spark, p).collect()
    )
    out = sim.ivf_maintenance(
        spark, p, retrain_balance=worst_before - 0.1, compact_after_keys=2
    )
    assert out["action"] == "retrain"
    assert out["worst_balance"] == pytest.approx(worst_before)
    worst_after = max(
        r["balance"] for r in sim.ivf_index_stats(spark, p).collect()
    )
    assert worst_after < worst_before
    # row conservation across the whole episode
    stats = sim.ivf_index_stats(spark, p).collect()
    assert sum(r["n_vectors"] for r in stats) == 200 + 3 * 50 + 2_000


def test_ivf_store_lifecycle_on_file_uri(spark, tmp_path):
    """r11 Hadoop-FS branch coverage for the IVF store (the third
    persisted-index family; minhash and gram twins live in
    test_probe_pruning / test_decontam): save → search → compact
    (CURRENT swap through operators/_fsio.py's Hadoop branch) →
    search again on a ``file:`` URI root, row-identical across the
    generation swap."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import _fsio
    from sensor_data_pipeline___spark.operators.similarity import (
        _store_root,
        ivf_index_compact,
        ivf_topk_indexed,
        save_ivf_index,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 5)
    path = "file:" + str(tmp_path / "ivf_uri")
    assert _fsio.is_uri(path)
    save_ivf_index(corpus, path, ncells=8, iters=1)
    before = sorted(
        map(
            tuple,
            ivf_topk_indexed(spark, path, queries, k=5, nprobe=3).collect(),
        )
    )
    assert before

    ivf_index_compact(spark, path)
    root = _store_root(path)
    assert root != path and root.startswith("file:")  # pointer swapped
    after = sorted(
        map(
            tuple,
            ivf_topk_indexed(spark, path, queries, k=5, nprobe=3).collect(),
        )
    )
    assert after == before
