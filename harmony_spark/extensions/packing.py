"""Training-sequence assembly: packing documents into fixed-capacity
context windows and chunking documents into overlapping token windows.

An LLM training pipeline's last mile: tokenized documents must be
packed into context-length sequences (minimizing padding waste) and/or
chunked into overlapping windows (RAG indexing, long-doc splitting).
Both are expressed Spark-first:

- Packing is NEXT-FIT inside deterministic hash buckets: the bucket is
  the unit of parallelism (thousands of independent buckets at corpus
  scale), and within a bucket the packer is a single O(n) streaming
  pass whose state is ONE counter — applyInPandas over the bucket
  group, never a global sequential scan. The DuckDB oracle replays the
  identical fold as a recursive CTE (one row per bucket per step), an
  independent formulation agreeing bin-for-bin.
- Chunking is a pure per-row explode (sequence of chunk starts +
  array slicing) — zero shuffle, scales embarrassingly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.registry import register

PACK_CAPACITY = 128  # tokens per packed sequence
PACK_BUCKETS = 8  # deterministic parallelism unit (doc_id % buckets)


def pack_next_fit(docs: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """Pack documents (columns: bucket, doc_id, n_tokens) into bins of
    ``capacity`` tokens with the NEXT-FIT rule: docs stream in
    deterministic doc_id order within each bucket; a doc opens a new
    bin when it doesn't fit the current one. Docs longer than the
    capacity must be truncated upstream (the packer asserts nothing —
    a doc with n_tokens > capacity simply occupies a bin alone).

    Returns DataFrame[bucket, bin, n_docs, fill]. Next-fit is the
    packing rule streaming pipelines actually run (one pass, O(1)
    state, ≥50% fill guaranteed when docs ≤ capacity); first-fit-
    decreasing would need random access to every open bin.
    """

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, n_docs, fills = [], [], []
        cur_bin, cur_fill, cur_docs = 0, 0, 0
        for tok in pdf["n_tokens"]:
            if cur_docs > 0 and cur_fill + tok > capacity:
                bins.append(cur_bin)
                n_docs.append(cur_docs)
                fills.append(cur_fill)
                cur_bin += 1
                cur_fill, cur_docs = 0, 0
            cur_fill += int(tok)
            cur_docs += 1
        if cur_docs > 0:
            bins.append(cur_bin)
            n_docs.append(cur_docs)
            fills.append(cur_fill)
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"].iloc[0],
                "bin": bins,
                "n_docs": n_docs,
                "fill": fills,
            }
        )

    return docs.groupBy("bucket").applyInPandas(
        _pack, schema="bucket long, bin long, n_docs long, fill long"
    )


@register(
    "q165_sequence_packing",
    oracle=f"""
        WITH RECURSIVE toks AS (
          SELECT doc_id % {PACK_BUCKETS} AS bucket, doc_id,
                 LEAST(len(string_split_regex(lower(text), '\\s+')),
                       {PACK_CAPACITY}) AS n_tokens
          FROM documents
        ),
        ordered AS (
          SELECT bucket, doc_id, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id)
                   AS rn
          FROM toks
        ),
        pack AS (
          SELECT bucket, rn, n_tokens AS fill, CAST(0 AS BIGINT) AS bin
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.bucket, o.rn,
                 CASE WHEN p.fill + o.n_tokens > {PACK_CAPACITY}
                      THEN o.n_tokens ELSE p.fill + o.n_tokens END,
                 CASE WHEN p.fill + o.n_tokens > {PACK_CAPACITY}
                      THEN p.bin + 1 ELSE p.bin END
          FROM pack p JOIN ordered o
            ON o.bucket = p.bucket AND o.rn = p.rn + 1
        )
        SELECT bucket, bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(fill) AS BIGINT) AS fill
        FROM pack GROUP BY bucket, bin ORDER BY bucket, bin
    """,
    doc="Sequence packing for LLM training: whitespace token counts "
    "(capacity-truncated) are packed NEXT-FIT into 128-token context "
    "bins inside deterministic doc_id%8 hash buckets. The bucket is "
    "the parallelism unit — at 100 TB you run thousands of buckets, "
    "each an independent single-pass fold with one counter of state "
    "(applyInPandas per bucket; the Arrow batch carries (doc_id, "
    "n_tokens) pairs, never text). The oracle replays the identical "
    "fold as a DuckDB recursive CTE advancing every bucket one doc "
    "per iteration — an independent sequential formulation agreeing "
    "bin-for-bin on (n_docs, fill). Output fill = MAX of the running "
    "fill, which at the fold's end IS the bin's token sum.",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    toks = table_parallel(spark, sf, "documents").select(
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        "doc_id",
        F.least(
            F.size(F.split(F.lower("text"), r"\s+")), F.lit(PACK_CAPACITY)
        ).alias("n_tokens"),
    )
    return pack_next_fit(toks).orderBy("bucket", "bin")


CHUNK_SIZE = 32  # tokens per chunk
CHUNK_STRIDE = 24  # tokens between chunk starts (8-token overlap)


@register(
    "q166_doc_chunking",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS arr,
                 len(string_split_regex(lower(text), '\\s+')) AS n
          FROM documents
        ),
        starts AS (
          SELECT doc_id, arr, n, UNNEST(generate_series(1, n, {CHUNK_STRIDE}))
                   AS start
          FROM toks WHERE n > 0
        )
        SELECT doc_id,
               CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(LEAST({CHUNK_SIZE}, n - start + 1) AS BIGINT)
                 AS n_chunk_tokens,
               arr[start] AS first_token,
               arr[LEAST(n, start + {CHUNK_SIZE} - 1)] AS last_token
        FROM starts ORDER BY doc_id, chunk_idx
    """,
    doc="Overlapping token-window chunking (32-token chunks, stride 24 "
    "= 8-token overlap): the RAG-indexing / long-document splitter. "
    "Pure per-row algebra — tokenize once, explode a SEQUENCE of "
    "chunk starts, index the token array for the boundary tokens — "
    "so the plan has ZERO shuffles and parallelizes with the scan; "
    "chunk text itself is never materialized here (a downstream "
    "projection can array_join the slice), keeping the exploded "
    "row narrow. Contract: stride-aligned starts, last chunk "
    "truncated, empty docs dropped.",
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    toks = table_parallel(spark, sf, "documents").select(
        "doc_id",
        F.split(F.lower("text"), r"\s+").alias("arr"),
        F.size(F.split(F.lower("text"), r"\s+")).alias("n"),
    )
    starts = toks.where(F.col("n") > 0).select(
        "doc_id",
        "arr",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.col("n"), F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    return starts.select(
        "doc_id",
        F.floor((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias(
            "chunk_idx"
        ),
        F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start") + 1)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.element_at("arr", F.col("start")).alias("first_token"),
        F.element_at(
            "arr", F.least(F.col("n"), F.col("start") + CHUNK_SIZE - 1)
        ).alias("last_token"),
    ).orderBy("doc_id", "chunk_idx")
