"""Correctness gate for the BPE tokenizer (extensions/tokenizer.py):
a hand-computed golden case, distributed-vs-driver parity, and the
count invariants. The q135 registry row is rows-only (the merge loop is
not SQL-expressible); these tests are its oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmony_spark.extensions.tokenizer import (
    _encoder,
    bpe_token_counts,
    learn_bpe_merges,
)


def test_bpe_golden_small_case(spark):
    """'low low low lower lowest': the most frequent pairs are inside
    'low', so the first merges must build it up; encoding 'low'
    with enough merges collapses to a single token + end marker."""
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(docs, n_merges=10, max_words=100)
    assert len(merges) > 0
    # every learned merge must come from adjacent symbols of the sample
    enc = _encoder(merges)
    # 'low' appears 5x (as prefix too) -> fully merged: one token or two
    assert enc("low") <= 2
    # unseen word with no shared pairs: one symbol per char + end marker
    assert enc("xyz") == 4


def test_bpe_more_merges_never_increase_tokens(spark, sf_dir):
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    m_few = learn_bpe_merges(docs, n_merges=20, max_words=5000)
    m_many = learn_bpe_merges(docs, n_merges=100, max_words=5000)
    assert m_many[: len(m_few)] == m_few  # learning is prefix-stable
    e_few, e_many = _encoder(m_few), _encoder(m_many)
    for w in ("the", "document", "internationalization", "zz9"):
        assert e_many(w) <= e_few(w)
        assert 1 <= e_many(w) <= len(w) + 1  # between 1 and char count + </w>


def test_bpe_distributed_apply_matches_driver(spark, sf_dir):
    """mapInPandas apply == a driver-side Python loop over the same
    merge table: the distribution changes nothing."""
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(40)
    merges = learn_bpe_merges(docs, n_merges=50, max_words=5000)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    enc = _encoder(merges)
    want = {}
    for r in docs.collect():
        ws = r["text"].lower().split()
        want[r["doc_id"]] = (len(ws), sum(enc(w) for w in ws))
    assert got == want


def test_q135_registry_row(spark, sf_dir):
    from harmony_spark.registry import load_all

    out = load_all()["q135_bpe_tokens"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # fertility: BPE tokens per word must be >= 1 (end marker) and
        # bounded by chars-per-word + 1
        assert r["bpe_token_sum"] >= r["word_sum"] > 0
        assert 1.0 <= r["fertility"] <= 30.0
