"""Large-k BPE encode measurement (SCALING.md, VERDICT r11 directive
#1): how both encode strategies behave as the vocabulary grows from
demo-sized (k=5) to production-shaped (k=256) at sf0.1.

Fits ONE k=256 vocabulary on the sf0.1 documents (greedy BPE merges
are prefix-consistent: the first k merges of a longer run ARE the
k-merge vocabulary, so the k∈{5,32,256} stores are prefix slices of a
single fit), then for each (k, strategy) measures:

- ``analyze_s`` — plan build + Catalyst analysis (DataFrame
  construction through schema resolution), the cost that creeps
  superlinear for the inline k-projection chain;
- ``run_s`` / ``rows_per_s`` — executing the encode over the
  replicated corpus (``--factor`` id-offset copies of the 5 000 sf0.1
  documents, odd replicas text-suffixed as in scale_sweep.py) into a
  count+sum sink, measuring engine work rather than row transfer.

Usage::

    python scripts/bpe_encode_scale_check.py [--factor 20] \
        [--src /root/testdata/sf0.1] [--ks 5,32,256] \
        [--checkpoint-every 64]

One JSON line to stdout, markdown table to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.session import get_spark
from sensor_data_pipeline___spark.sources import readers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--ks", default="5,32,256")
    ap.add_argument("--checkpoint-every", type=int, default=64)
    ap.add_argument(
        "--inline-max-run-k",
        type=int,
        default=64,
        help="above this k the inline strategy records analysis time "
        "only (its per-row fold cost is linear in k by construction — "
        "k=256 over the replicated corpus is tens of minutes of "
        "measurement for a strategy the auto-dispatch never picks "
        "there)",
    )
    ap.add_argument(
        "--enrich-words",
        type=int,
        default=10,
        help="append this many deterministic md5-chunk pseudo-words "
        "per doc before fit AND encode: the synthetic documents table "
        "has only ~31 distinct words (its character-pair space "
        "exhausts after ~89 merges), so a true k=256 vocabulary needs "
        "a Heaps-like word tail; hex chunks give thousands of "
        "distinct words and a rich pair space",
    )
    ap.add_argument(
        "--synthetic-ks",
        default="",
        help="comma list (e.g. 256,4096,32768): skip the fit and "
        "measure the word_cache encoders against a SYNTHETIC "
        "well-formed vocabulary built from the corpus's own distinct "
        "words (prefix chains: (w[:1],w[1]), (w[:2],w[2]), … — every "
        "merge's left operand is produced by a strictly earlier "
        "merge, the precondition rankdict needs, and the merges all "
        "FIRE on real words, so this is a heavy-merge load, not a "
        "no-op sweep). Learning 32k merges is a week of shuffles; "
        "production-k encode behavior doesn't need a production fit, "
        "just a production-SIZED well-formed merge list",
    )
    ap.add_argument(
        "--arrow-max-run-k",
        type=int,
        default=4096,
        help="above this k the arrow encoder records analysis only "
        "(its per-word guard sweep is O(k); at k=32768 over ~50k "
        "distinct words that is ~3e9 set probes of pure Python — "
        "the regime the rank-dict encoder exists for)",
    )
    ap.add_argument("--work", default="/tmp/spark_bpe_scale")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from sensor_data_pipeline___spark.operators import text as T

    spark = get_spark(app_name="bpe-encode-scale")
    docs = readers.table(spark, "documents", args.src).select(
        "doc_id", "text"
    )
    if args.enrich_words > 0:
        tail = F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(f"|{i}"))),
                    1,
                    6,
                )
                for i in range(args.enrich_words)
            ],
        )
        docs = docs.select(
            "doc_id", F.concat_ws(" ", "text", tail).alias("text")
        )

    if args.synthetic_ks:
        _synthetic_main(spark, docs, args)
        return

    # one fit at max k; per-k stores are prefix slices of its merges
    fit_path = os.path.join(args.work, f"fit_k{max(ks)}")
    t0 = time.monotonic()
    T.save_bpe_vocab(docs, fit_path, k=max(ks))
    fit_s = time.monotonic() - t0
    merges = spark.read.parquet(fit_path + "/merges")
    n_learned = merges.count()
    if n_learned < max(ks):
        raise SystemExit(
            f"vocabulary exhausted at {n_learned} merges < k={max(ks)} "
            "— enrich the corpus (--enrich-words) so every measured "
            "k row is a real vocabulary of that size"
        )
    stores = {}
    for k in ks:
        p = os.path.join(args.work, f"k{k}")
        merges.filter(F.col("merge_rank") <= k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + "/merges")
        stores[k] = p

    corpus, n_rows = _replicate(spark, docs, args.factor, args.work)

    rows = []
    variants = (
        ("inline", "auto"),
        ("word_cache", "fold"),
        ("word_cache", "arrow"),
    )
    for k in ks:
        for strategy, word_encoder in variants:
            label = (
                strategy if strategy == "inline"
                else f"{strategy}/{word_encoder}"
            )
            t0 = time.monotonic()
            df = T.encode_against_vocab(
                spark,
                stores[k],
                corpus,
                strategy=strategy,
                checkpoint_every=args.checkpoint_every,
                word_encoder=word_encoder,
            )
            df.schema  # force analysis
            analyze_s = time.monotonic() - t0
            if strategy == "inline" and k > args.inline_max_run_k:
                rows.append(
                    {
                        "k": k,
                        "strategy": label,
                        "analyze_s": round(analyze_s, 2),
                        "run_s": None,
                        "rows_per_s": None,
                        "n_tokens": None,
                    }
                )
                print(
                    f"k={k:<4} {label:<17} analyze {analyze_s:7.2f}s"
                    "  run SKIPPED (--inline-max-run-k)",
                    file=sys.stderr,
                    flush=True,
                )
                continue
            t0 = time.monotonic()
            got = df.agg(
                F.count("*").alias("n"),
                F.sum("n_tokens").alias("tok"),
            ).collect()[0]
            run_s = time.monotonic() - t0
            rows.append(
                {
                    "k": k,
                    "strategy": label,
                    "analyze_s": round(analyze_s, 2),
                    "run_s": round(run_s, 2),
                    "rows_per_s": round(n_rows / run_s),
                    "n_tokens": int(got["tok"]),
                }
            )
            print(
                f"k={k:<4} {label:<17} analyze {analyze_s:7.2f}s  "
                f"run {run_s:7.2f}s  {n_rows / run_s:>9.0f} rows/s  "
                f"tokens {got['tok']}",
                file=sys.stderr,
                flush=True,
            )

    # cross-strategy token totals must agree per k (same semantics)
    for k in ks:
        tks = {
            r["n_tokens"]
            for r in rows
            if r["k"] == k and r["n_tokens"] is not None
        }
        assert len(tks) == 1, (k, tks)

    print(
        json.dumps(
            {
                "metric": "bpe_encode_scale",
                "sf_src": args.src,
                "corpus_rows": n_rows,
                "fit_k": max(ks),
                "fit_s": round(fit_s, 1),
                "checkpoint_every": args.checkpoint_every,
                "rows": rows,
            }
        )
    )


def _replicate(spark, docs, factor: int, work: str):
    """--factor id-offset copies, odd replicas suffixed (the
    scale_sweep.py mixture posture), materialized to parquet."""
    rep = docs.crossJoin(
        spark.range(factor).select(F.col("id").alias("_r"))
    ).select(
        (F.col("doc_id") + F.col("_r") * F.lit(10_000_000_000)).alias(
            "doc_id"
        ),
        F.when(
            F.col("_r") % 2 == 1,
            F.concat(F.col("text"), F.lit(" replica suffix")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    rep.write.mode("overwrite").parquet(os.path.join(work, "corpus"))
    corpus = spark.read.parquet(os.path.join(work, "corpus"))
    return corpus, corpus.count()


def _synthetic_main(spark, docs, args) -> None:
    """Production-SIZED vocabulary sweep: well-formed prefix-chain
    merges from the corpus's distinct words (see --synthetic-ks),
    word_cache/arrow vs word_cache/rankdict. The distinct-word
    collect is harness-only (bounded by the corpus vocabulary; the
    operators themselves never collect the word table)."""
    from sensor_data_pipeline___spark.operators._local import local_df
    from sensor_data_pipeline___spark.operators import text as T

    ks = sorted(int(k) for k in args.synthetic_ks.split(","))
    words = sorted(
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .distinct()
        .collect()
    )
    seen: set = set()
    merges: list = []
    for w in words:
        for i in range(1, len(w)):
            pair = (w[:i], w[i])
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
        if len(merges) >= max(ks):
            break
    if len(merges) < max(ks):
        raise SystemExit(
            f"only {len(merges)} chain merges available < k={max(ks)} "
            "— raise --enrich-words for a longer word tail"
        )
    stores = {}
    for k in ks:
        p = os.path.join(args.work, f"syn_k{k}")
        rows = [
            (rank, left, right, 0)
            for rank, (left, right) in enumerate(merges[:k], start=1)
        ]
        local_df(
            spark, rows, "merge_rank int, left string, right string, n long"
        ).coalesce(1).write.mode("overwrite").parquet(p + "/merges")
        stores[k] = p

    corpus, n_rows = _replicate(spark, docs, args.factor, args.work)
    print(
        f"synthetic vocab: {len(words)} distinct words, "
        f"{len(merges)} chain merges, corpus {n_rows} rows",
        file=sys.stderr,
        flush=True,
    )
    rows_out = []
    for k in ks:
        for word_encoder in ("arrow", "rankdict"):
            label = f"word_cache/{word_encoder}"
            t0 = time.monotonic()
            df = T.encode_against_vocab(
                spark,
                stores[k],
                corpus,
                strategy="word_cache",
                word_encoder=word_encoder,
            )
            df.schema
            analyze_s = time.monotonic() - t0
            if word_encoder == "arrow" and k > args.arrow_max_run_k:
                rows_out.append(
                    {
                        "k": k,
                        "strategy": label,
                        "analyze_s": round(analyze_s, 2),
                        "run_s": None,
                        "rows_per_s": None,
                        "n_tokens": None,
                    }
                )
                print(
                    f"k={k:<6} {label:<20} run SKIPPED "
                    "(--arrow-max-run-k)",
                    file=sys.stderr,
                    flush=True,
                )
                continue
            t0 = time.monotonic()
            got = df.agg(
                F.count("*").alias("n"),
                F.sum("n_tokens").alias("tok"),
            ).collect()[0]
            run_s = time.monotonic() - t0
            rows_out.append(
                {
                    "k": k,
                    "strategy": label,
                    "analyze_s": round(analyze_s, 2),
                    "run_s": round(run_s, 2),
                    "rows_per_s": round(n_rows / run_s),
                    "n_tokens": int(got["tok"]),
                }
            )
            print(
                f"k={k:<6} {label:<20} analyze {analyze_s:6.2f}s  "
                f"run {run_s:8.2f}s  {n_rows / run_s:>9.0f} rows/s  "
                f"tokens {got['tok']}",
                file=sys.stderr,
                flush=True,
            )
    # encoder equivalence: token totals must agree per k wherever
    # both encoders ran (rankdict's well-formedness claim, checked on
    # the measured load itself)
    for k in ks:
        tks = {
            r["n_tokens"]
            for r in rows_out
            if r["k"] == k and r["n_tokens"] is not None
        }
        assert len(tks) == 1, (k, tks)
    print(
        json.dumps(
            {
                "metric": "bpe_encode_scale_synthetic",
                "sf_src": args.src,
                "corpus_rows": n_rows,
                "n_distinct_words": len(words),
                "rows": rows_out,
            }
        )
    )


if __name__ == "__main__":
    main()
