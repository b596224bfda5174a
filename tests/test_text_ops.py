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
