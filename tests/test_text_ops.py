"""Edge-case fixtures for the intra-document text operators
(operators/text.py: collapse_repeats, char_entropy) — the oracle
parity tests cover the corpus distribution; these pin the corners the
synthetic corpus never hits (empty text, single token, all-identical
tokens, degenerate vs uniform character distributions)."""

from __future__ import annotations

import math

import pytest

from sensor_data_pipeline___spark.operators.text import (
    char_entropy,
    collapse_repeats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_collapse_repeats_fixtures(spark):
    rows = {
        r.doc_id: r
        for r in collapse_repeats(
            _docs(
                spark,
                [
                    "a a b b b c a",  # runs collapse, non-adjacent kept
                    "x",  # single token unchanged
                    "",  # empty text: one empty token, unchanged
                    "same same same same",  # whole doc is one run
                    "a b a b",  # alternation: nothing to collapse
                ],
            )
        ).collect()
    }
    assert rows[0].text == "a b c a"
    assert (rows[0].n_tokens_before, rows[0].n_tokens_after) == (7, 4)
    assert rows[1].text == "x"
    assert rows[2].text == ""
    assert rows[3].text == "same"
    assert (rows[3].n_tokens_before, rows[3].n_tokens_after) == (4, 1)
    assert rows[4].text == "a b a b"


def test_collapse_repeats_idempotent(spark):
    once = collapse_repeats(_docs(spark, ["q q w w q q q e"]))
    twice = collapse_repeats(once.select("doc_id", "text"))
    a = once.select("doc_id", "text").collect()
    b = twice.select("doc_id", "text").collect()
    assert a == b


def test_char_entropy_extremes(spark):
    rows = {
        r.doc_id: r
        for r in char_entropy(
            _docs(
                spark,
                [
                    "aaaaaaaa",  # one symbol: entropy exactly 0
                    "abababab",  # two equiprobable symbols: exactly 1
                    "abcdefgh",  # eight equiprobable: exactly 3
                ],
            )
        ).collect()
    }
    assert rows[0].distinct_chars == 1
    assert rows[0].char_entropy == pytest.approx(0.0, abs=1e-12)
    assert rows[1].distinct_chars == 2
    assert rows[1].char_entropy == pytest.approx(1.0, abs=1e-12)
    assert rows[2].distinct_chars == 8
    assert rows[2].char_entropy == pytest.approx(3.0, abs=1e-12)


def test_char_entropy_orders_quality(spark):
    """Degenerate text scores strictly below varied text of the same
    length — the property the quality filter relies on."""
    rows = {
        r.doc_id: r.char_entropy
        for r in char_entropy(
            _docs(spark, ["aaaa aaaa aaaa", "the quick brown"])
        ).collect()
    }
    assert rows[0] < rows[1]
    assert rows[1] < math.log2(15) + 1e-9  # upper bound: log2(length)


def test_chunk_documents_coverage_and_tail(spark):
    from sensor_data_pipeline___spark.operators.text import chunk_documents

    # 40 tokens, chunk 32 / stride 24 -> chunks at 0 (32 toks) and 24
    # (ragged 16-token tail); every token covered, overlap of 8
    text40 = " ".join(f"t{i}" for i in range(40))
    out = {
        (r.doc_id, r.chunk_ix): r
        for r in chunk_documents(_docs(spark, [text40, "tiny doc"])).collect()
    }
    assert {k for k in out} == {(0, 0), (0, 1), (1, 0)}
    assert out[(0, 0)].chunk_n_tokens == 32
    assert out[(0, 0)].chunk_text.startswith("t0 ") 
    assert out[(0, 1)].chunk_n_tokens == 16
    assert out[(0, 1)].chunk_text.split(" ")[0] == "t24"
    assert out[(0, 1)].chunk_text.split(" ")[-1] == "t39"
    # short doc: exactly one chunk, never zero
    assert out[(1, 0)].chunk_text == "tiny doc"
    assert out[(1, 0)].chunk_n_tokens == 2


def test_chunk_documents_exact_boundary_no_phantom_tail(spark):
    from sensor_data_pipeline___spark.operators.text import chunk_documents

    # exactly one chunk's worth of tokens -> one chunk, no empty tail
    text32 = " ".join(f"t{i}" for i in range(32))
    rows = chunk_documents(_docs(spark, [text32])).collect()
    assert len(rows) == 1 and rows[0].chunk_n_tokens == 32

    # 33 tokens -> full chunk + 9-token tail (stride 24)
    text33 = " ".join(f"t{i}" for i in range(33))
    rows = sorted(
        chunk_documents(_docs(spark, [text33])).collect(),
        key=lambda r: r.chunk_ix,
    )
    assert [r.chunk_n_tokens for r in rows] == [32, 9]


def test_chunk_documents_rejects_bad_stride(spark):
    from sensor_data_pipeline___spark.operators.text import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a b"]), chunk_tokens=8, stride=9)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a b"]), chunk_tokens=8, stride=0)


def test_drop_repeated_segments_removes_cross_doc_boilerplate(spark):
    """The C4-style recipe: a 10-token boilerplate block shared by
    many documents is dropped from every one; unique content survives
    with segment order preserved; a doc that is pure boilerplate
    disappears; and at max_repeat=inf everything round-trips."""
    from sensor_data_pipeline___spark.operators import text as T

    boiler = " ".join(f"b{i}" for i in range(10))
    uniq = lambda d, s: " ".join(f"u{d}x{s}t{i}" for i in range(10))  # noqa: E731
    rows = [
        # boilerplate + unique + boilerplate-again (same global seg)
        (1, boiler + " " + uniq(1, 0) + " " + uniq(1, 1)),
        (2, boiler + " " + uniq(2, 0)),
        (3, uniq(3, 0) + " " + boiler),
        (4, boiler),  # pure boilerplate -> document disappears
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in T.drop_repeated_segments(docs, seg_tokens=10).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["text"] == uniq(1, 0) + " " + uniq(1, 1)
    assert out[2]["text"] == uniq(2, 0)
    assert out[3]["text"] == uniq(3, 0)
    assert out[1]["n_dropped_segments"] == 1
    assert out[3]["n_dropped_segments"] == 1

    # no-op mode: nothing exceeds max_repeat -> identity reassembly
    full = {
        r.doc_id: r.text
        for r in T.drop_repeated_segments(
            docs, seg_tokens=10, max_repeat=10
        ).collect()
    }
    assert full == {d: t for d, t in rows}


def test_drop_repeated_segments_preserves_order_with_ragged_tail(spark):
    """Segments reassemble in seg_idx order including a ragged tail
    window shorter than seg_tokens."""
    from sensor_data_pipeline___spark.operators import text as T

    text = " ".join(f"w{i}" for i in range(23))  # 3 segments: 10/10/3
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = T.drop_repeated_segments(docs, seg_tokens=10).collect()
    assert out[0]["text"] == text and out[0]["n_dropped_segments"] == 0


def test_duplicate_ngram_key_modes_agree(spark):
    """The scale-default xxhash64 gram key and the oracle-parity md5
    key must produce identical coverage and identical trimmed text —
    the keys only name the grams; collisions are the only way they
    could diverge and there are none on this corpus."""
    from sensor_data_pipeline___spark.operators import text as T
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    fast = sorted(
        map(tuple, T.duplicate_ngram_coverage(docs, key="xxhash64").collect())
    )
    slow = sorted(
        map(tuple, T.duplicate_ngram_coverage(docs, key="md5").collect())
    )
    assert fast == slow and len(fast) > 0

    tf = sorted(map(tuple, T.trim_duplicate_ngrams(docs, key="xxhash64")
                    .collect()))
    tm = sorted(map(tuple, T.trim_duplicate_ngrams(docs, key="md5")
                    .collect()))
    assert tf == tm


def test_bpe_pair_counts_weights_by_word_frequency(spark):
    """Pair counts are word-frequency-weighted over the VOCABULARY:
    'aaa' appearing 3x contributes 3 to 'aa' per window (2 windows),
    single-char and repeated words fold correctly, and the top_k head
    breaks count ties by pair ascending."""
    from sensor_data_pipeline___spark.operators import text

    docs = spark.createDataFrame(
        [("aaa aaa aaa bc x",), ("bc bc zz",)], "text string"
    )
    got = {r.pair: r.n for r in text.bpe_pair_counts(docs).collect()}
    # 'aaa' freq 3 -> windows aa,aa => aa: 6 ; 'bc' freq 3 -> bc: 3 ;
    # 'zz' freq 1 -> zz: 1 ; 'x' dropped (len < 2)
    assert got == {"aa": 6, "bc": 3, "zz": 1}
    top = [r.pair for r in text.bpe_pair_counts(docs, top_k=2).collect()]
    assert top == ["aa", "bc"]


def test_bpe_learn_merges_greedy_fold_semantics(spark):
    """The iterated BPE driver learns the expected merges on a corpus
    crafted so each round's winner and the greedy left-to-right merge
    behavior ("a a a a a" -> "aa aa a", runs merge left-aligned and
    non-overlapping) are hand-checkable."""
    from sensor_data_pipeline___spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "aaaaa aaaaa abab"), (2, "aaaaa abab abab")],
        "doc_id long, text string",
    )
    got = [
        (r.merge_rank, r.pair, r.n)
        for r in bpe_learn_merges(docs, k=3).orderBy("merge_rank").collect()
    ]
    # round 1: 'a a' appears 4x per 'aaaaa' (freq 3) + 1x per 'abab'?
    # no — 'abab' has pairs (a,b),(b,a),(a,b): 'a a' count = 4*3 = 12;
    # 'a b' = 2*3 = 6; 'b a' = 3. round 1 merges (a,a):
    # 'aaaaa' -> 'aa aa a' (greedy left-aligned), 'abab' unchanged.
    assert got[0] == (1, "a a", 12)
    # round 2: 'aa aa' 3, 'aa a' 3, 'a b' 6, 'b a' 3 -> 'a b' wins;
    # 'abab' -> 'ab ab'
    assert got[1] == (2, "a b", 6)
    # round 3: 'aa aa' 3, 'aa a' 3, 'ab ab' 3 -> tiebreak pair ASC:
    # 'aa a' < 'aa aa' < 'ab ab'
    assert got[2] == (3, "aa a", 3)


def test_save_unigram_lm_empty_fit_raises(spark, tmp_path):
    """Review r9: an empty reference corpus has no score distribution —
    percentile returns NULL and save_unigram_lm must refuse with a
    clear error instead of crashing on float(None) (or worse,
    persisting NaN cuts that band every future batch 'head')."""
    from sensor_data_pipeline___spark.operators.text import save_unigram_lm

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no scores"):
        save_unigram_lm(empty, str(tmp_path / "lm"))


def test_save_unigram_lm_failed_refit_preserves_store(spark, tmp_path):
    """Review r10 (advice, medium): validation must run BEFORE the
    mode('overwrite') write to freq/ — a failed re-fit on an empty
    corpus must leave the EXISTING store fully intact (not a corrupted
    empty-freq + stale-meta hybrid that loads without error and
    mis-bands every batch)."""
    from sensor_data_pipeline___spark.operators.text import (
        save_unigram_lm,
        unigram_bands_against_lm,
    )

    path = str(tmp_path / "lm")
    docs = _docs(
        spark, ["the cat sat", "the dog ran", "a cat ran fast today"]
    )
    save_unigram_lm(docs, path)
    before = {
        r.doc_id: (r.n_tokens, r.lm_score, r.band)
        for r in unigram_bands_against_lm(
            spark, path, docs, cache_store=False
        ).collect()
    }
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no scores"):
        save_unigram_lm(empty, path)
    after = {
        r.doc_id: (r.n_tokens, r.lm_score, r.band)
        for r in unigram_bands_against_lm(
            spark, path, docs, cache_store=False
        ).collect()
    }
    assert after == before


def test_save_bpe_vocab_persists_ordered_merges(spark, tmp_path):
    """save_bpe_vocab persists the same merges bpe_learn_merges
    returns, in application (rank) order, and load_bpe_merges round-
    trips them as the ordered (left, right) list."""
    from sensor_data_pipeline___spark.operators.text import (
        load_bpe_merges,
        save_bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "aaaaa aaaaa abab"), (2, "aaaaa abab abab")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bpe")
    save_bpe_vocab(docs, path, k=3)
    assert load_bpe_merges(spark, path) == [
        ("a", "a"),
        ("a", "b"),
        ("aa", "a"),
    ]


def test_encode_against_vocab_greedy_rank_order(spark, tmp_path):
    """Encoding applies the k merges in rank order, each greedy
    left-to-right non-overlapping, on the same hand-checkable corpus
    as the learn test: merges (a,a),(a,b),(aa,a) turn 'aaaaa' into
    'aa aaa' (aa aa a, then the rank-3 merge folds the trailing
    'aa a') and 'abab' into 'ab ab'."""
    from sensor_data_pipeline___spark.operators.text import (
        encode_against_vocab,
        save_bpe_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "aaaaa aaaaa abab"), (2, "aaaaa abab abab")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bpe")
    save_bpe_vocab(docs, path, k=3)
    got = {
        r.doc_id: (r.n_tokens, r.encoded)
        for r in encode_against_vocab(spark, path, docs).collect()
    }
    assert got == {
        1: (6, "aa aaa aa aaa ab ab"),
        2: (6, "aa aaa ab ab ab ab"),
    }


def test_encode_against_vocab_preserves_degenerate_docs(spark, tmp_path):
    """Every input row survives encoding: empty text, NULL text, and
    single-char words (never seen by the len>=2 learn filter) encode
    deterministically instead of dropping."""
    from sensor_data_pipeline___spark.operators.text import (
        encode_against_vocab,
        save_bpe_vocab,
    )

    fit = spark.createDataFrame(
        [(0, "aaaaa aaaaa abab")], "doc_id long, text string"
    )
    path = str(tmp_path / "bpe")
    save_bpe_vocab(fit, path, k=1)  # learns just (a, a)
    probe = spark.createDataFrame(
        [(1, ""), (2, None), (3, "b aa c"), (4, "a")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.encoded)
        for r in encode_against_vocab(spark, path, probe).collect()
    }
    assert got == {
        1: (0, ""),
        2: (0, ""),
        3: (3, "b aa c"),
        4: (1, "a"),
    }


def test_encode_against_vocab_is_lossless(spark, tmp_path):
    """Tokenization must be a segmentation, never a rewrite: for every
    document, the encoded token sequence with separators removed is
    byte-identical to the original text with spaces removed — pinned
    distributively over the full sf0.001 corpus (one aggregate, no
    collect of the texts)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.text import (
        encode_against_vocab,
        save_bpe_vocab,
    )
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "bpe")
    save_bpe_vocab(docs, path, k=5)
    enc = encode_against_vocab(spark, path, docs)
    joined = docs.select("doc_id", "text").join(enc, "doc_id")
    bad = joined.filter(
        F.regexp_replace("encoded", " ", "")
        != F.regexp_replace("text", " ", "")
    ).count()
    assert bad == 0


def test_rankdict_encoder_duplicate_pair_keeps_first_rank(spark):
    """A merge list containing the SAME pair at two ranks (legal in a
    hand-built store; a learned list never repeats a pair) must apply
    it at its FIRST (lowest) rank in the rankdict encoder — the
    documented setdefault semantics — and agree with the sequential
    fold, for which the duplicate second pass is a no-op."""
    from sensor_data_pipeline___spark.operators.text import (
        _rankdict_word_encode,
        apply_merge_rounds,
    )

    merges = [("a", "b"), ("ab", "c"), ("a", "b")]
    vocab = spark.createDataFrame(
        [("abc",), ("abab",), ("cab",)], "w string"
    )
    got = {
        r["w"]: list(r["_wtoks"])
        for r in _rankdict_word_encode(vocab, merges).collect()
    }
    want = {
        r["w"]: list(r["_wtoks"])
        for r in apply_merge_rounds(
            vocab, merges, "w", "_wtoks"
        ).collect()
    }
    assert got == want
    assert got["abc"] == ["abc"]
    assert got["abab"] == ["ab", "ab"]


def test_rankdict_token_count_matches_inline(spark, tmp_path):
    """The streaming production-k tokenize (rankdict_token_count)
    stamps the same counts as the inline JVM fold chain for a LEARNED
    (well-formed) vocabulary, including degenerate rows (NULL text,
    empty text, whitespace runs, single-char words)."""
    from sensor_data_pipeline___spark.operators.text import (
        load_bpe_merges,
        rankdict_token_count,
        save_bpe_vocab,
        stamp_bpe_token_count,
    )

    ref = spark.createDataFrame(
        [(i, "banana bandana ban banana") for i in range(4)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "vocab")
    save_bpe_vocab(ref, path, k=5)
    merges = load_bpe_merges(spark, path)
    probe = spark.createDataFrame(
        [
            (1, "banana ban"),
            (2, None),
            (3, ""),
            (4, "a  banana   x"),
            (5, "zzz unseen words"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_tokens_bpe
        for r in rankdict_token_count(probe, merges).collect()
    }
    want = {
        r.doc_id: r.n_tokens_bpe
        for r in stamp_bpe_token_count(probe, merges).collect()
    }  # k=5 ≤ 64 → inline dispatch
    assert got == want
    assert got[2] == 0 and got[3] == 0


def test_stamp_bpe_dispatch_large_k(spark):
    """At k > 64 the dispatcher takes the rank-dict Arrow pass (no
    k-deep projection chain) and still matches the word-cache arrow
    encoder's counts for a well-formed synthetic chain vocabulary."""
    from sensor_data_pipeline___spark.operators._local import local_df
    from sensor_data_pipeline___spark.operators.text import (
        _arrow_word_encode,
        stamp_bpe_token_count,
    )
    from pyspark.sql import functions as F

    words = [f"uid{n}" for n in range(200)]
    seen: set = set()
    merges: list = []
    for w in words:
        for i in range(1, len(w)):
            p = (w[:i], w[i])
            if p not in seen:
                seen.add(p)
                merges.append(p)
    assert len(merges) > 64
    docs = spark.createDataFrame(
        [(n, f"uid{n} uid{(n * 13) % 200} tok") for n in range(50)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_tokens_bpe
        for r in stamp_bpe_token_count(docs, merges).collect()
    }
    # independent count: arrow word encoder over the distinct words
    vocab = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    per_word = {
        r.w: len(r._wtoks)
        for r in _arrow_word_encode(vocab, merges).collect()
    }
    for r in docs.collect():
        want = sum(per_word[w] for w in r.text.split(" ") if w)
        assert got[r.doc_id] == want
