"""Real byte-pair-encoding tokenization as a distributed operator.

q47 counts tokens with a BPE-ish *regex*; this module runs an actual
BPE: a merge table learned offline (Sennrich et al. 2016 — the greedy
most-frequent-adjacent-pair loop every GPT-2-family tokenizer uses) and
applied corpus-wide. The split mirrors production LLM pipelines:

* ``learn_bpe_merges`` is DRIVER-side on a bounded sample — the vocab
  is an offline artifact like the IVF centroids or PQ codebooks
  (similarity.py), versioned with the model, never re-learned per scan.
  Word frequencies come from one distributed aggregate capped at
  ``max_words`` driver rows; the merge loop itself is pure Python over
  that histogram.
* ``bpe_token_counts`` is the distributed apply via ``mapInPandas`` —
  tokenization is the textbook case where a Pandas UDF is the RIGHT
  tool, not the slow path: the per-word merge loop is genuinely not
  expressible in relational operators, the work is embarrassingly
  parallel (row-local), the merge table broadcasts at KB size inside
  the serialized closure, and Arrow batching amortizes the
  Python-boundary cost. A per-word LRU memo exploits Zipf: the top few
  thousand word forms cover most of the corpus mass, so the merge loop
  runs once per distinct frequent word per batch, not once per token.

Determinism: frequency ties in learning break lexicographically, so the
same sample yields the same merges on any engine; the registry row is
rows-only (no SQL oracle can express the merge loop) and correctness is
pinned by a hand-computed golden case plus distributed-vs-driver parity
in tests/test_tokenizer.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table_parallel
from harmony_spark.registry import register

_END = "</w>"  # word-final marker, standard BPE


def _word_histogram(docs: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """(word, count) for the most frequent ``max_words`` words — one
    distributed aggregate; the driver never holds more rows than that."""
    rows = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["n"]) for r in rows]


def learn_bpe_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 200, max_words: int = 20000
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over the corpus word histogram.

    Returns the rank-ordered merge list (the tokenizer artifact).
    Deterministic: pair-count ties break lexicographically."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in _word_histogram(docs, text_col, max_words):
        vocab[tuple(w) + (_END,)] = vocab.get(tuple(w) + (_END,), 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max by count, then lexicographically greatest pair — any total
        # order works as long as it is deterministic across engines
        best_pair = max(pairs, key=lambda p: (pairs[p], p))
        if pairs[best_pair] < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        nv: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def _encoder(merges: list[tuple[str, str]]):
    """word -> token count, memoized per distinct word (Zipf: the memo
    hit rate is the corpus frequency mass of the top 200k forms)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @lru_cache(maxsize=200_000)
    def n_tokens(word: str) -> int:
        sym = list(word) + [_END]
        while len(sym) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return len(sym)

    return n_tokens


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Distributed BPE apply: (doc_id + passthrough cols..., n_words,
    n_bpe_tokens) via Arrow-batched mapInPandas."""
    passthrough = [c for c in docs.columns if c != text_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in docs.schema.fields
        if f.name != text_col
    )
    schema += ", n_words long, n_bpe_tokens long"

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _encoder(merges)  # one memo per task
        for pdf in batches:
            words = pdf[text_col].str.lower().str.split()
            out = pdf[passthrough].copy()
            out["n_words"] = words.str.len().fillna(0).astype("int64")
            out["n_bpe_tokens"] = [
                sum(enc(w) for w in ws) if isinstance(ws, list) else 0
                for ws in words
            ]
            yield out

    return docs.mapInPandas(apply, schema)


@register(
    "q135_bpe_tokens",
    oracle=None,  # the merge loop is not SQL-expressible: rows-only +
    # golden/parity tests (tests/test_tokenizer.py)
    doc="Real BPE tokenization, distributed: a 200-merge vocabulary "
    "learned driver-side from the corpus word histogram (bounded "
    "one-aggregate sample — the offline tokenizer artifact), then "
    "applied corpus-wide with Arrow-batched mapInPandas and a "
    "per-word memo (Zipf makes the memo hit rate ~the frequency mass "
    "of frequent forms). Output: per-source token census comparing "
    "whitespace words vs BPE tokens (the fertility ratio every "
    "training-budget estimate needs). This is the one operator class "
    "where Python-in-the-loop is the right design, and the plumbing "
    "(bounded driver state, broadcast-sized artifact, row-local "
    "apply) is what makes it hold at 100 TB.",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents").select("doc_id", "source", "text")
    merges = learn_bpe_merges(docs, n_merges=200, max_words=20000)
    counts = bpe_token_counts(docs, merges)
    return (
        counts.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("word_sum"),
            F.sum("n_bpe_tokens").cast("long").alias("bpe_token_sum"),
            F.round(
                F.sum("n_bpe_tokens").cast("double") / F.sum("n_words"), 6
            ).alias("fertility"),
        )
        .orderBy("source")
    )
