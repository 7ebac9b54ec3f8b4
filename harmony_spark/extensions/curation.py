"""Corpus-curation compositions for training-data pipelines: the
C4/Gopher-style quality-filter funnel (per-stage attrition report) and a
deterministic stratified corpus-mix sampler (per-language quotas).

Both are pure column-expression plans (no Python UDFs). The sampler uses
the salted two-phase top-k-per-group pattern so the per-group window never
sees more than ``n_salts * quota`` rows per language on the final exchange
-- the low-cardinality `lang` key would otherwise funnel the whole corpus
through a handful of window partitions at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.registry import register

# Filter thresholds (C4 / Gopher family). The exact values are arbitrary;
# the oracle applies the identical rule.
_MIN_TOKENS, _MAX_TOKENS = 15, 500
_MIN_TOK_LEN, _MAX_TOK_LEN = 3.0, 12.0
_MIN_DISTINCT_RATIO = 0.4


@register(
    "q102_quality_funnel",
    oracle=rf"""
        WITH sig AS (
          SELECT md5(text) AS digest,
                 len(string_split_regex(lower(text), '\s+')) AS n_tokens,
                 len(list_distinct(string_split_regex(lower(text), '\s+'))) AS n_distinct,
                 n_chars
          FROM documents
        ),
        flags AS (
          SELECT digest,
                 (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}) AS f1,
                 (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
                  AND CAST(n_chars AS DOUBLE) / n_tokens
                      BETWEEN {_MIN_TOK_LEN} AND {_MAX_TOK_LEN}) AS f2,
                 (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
                  AND CAST(n_chars AS DOUBLE) / n_tokens
                      BETWEEN {_MIN_TOK_LEN} AND {_MAX_TOK_LEN}
                  AND CAST(n_distinct AS DOUBLE) / n_tokens >= {_MIN_DISTINCT_RATIO}) AS f3
          FROM sig
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
                 CAST(COUNT(DISTINCT CASE WHEN f3 THEN digest END) AS BIGINT) AS s4
          FROM flags
        )
        SELECT '0_total' AS stage, total AS docs_remaining FROM agg
        UNION ALL SELECT '1_length', s1 FROM agg
        UNION ALL SELECT '2_token_len', s2 FROM agg
        UNION ALL SELECT '3_repetition', s3 FROM agg
        UNION ALL SELECT '4_exact_dedup', s4 FROM agg
        ORDER BY stage
    """,
    doc="Quality-filter funnel (C4/Gopher family): per-stage survivor "
    "census for length window -> mean-token-length window -> "
    "distinct-token-ratio (repetition) -> exact dedup of the survivors. "
    "The whole funnel is ONE scan and ONE aggregate: stage flags are "
    "cumulative booleans computed per document, the dedup stage is a "
    "conditional COUNT(DISTINCT md5) inside the same aggregate - no "
    "per-stage re-scan, so the funnel costs the same as a single quality "
    "query at any corpus size.",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.lower(F.col("text")), r"\s+")
    sig = table(spark, sf, "documents").select(
        F.md5("text").alias("digest"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        "n_chars",
    )
    f1 = F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
    f2 = f1 & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(
        _MIN_TOK_LEN, _MAX_TOK_LEN
    )
    f3 = f2 & (
        F.col("n_distinct").cast("double") / F.col("n_tokens") >= _MIN_DISTINCT_RATIO
    )
    agg = sig.select(f1.alias("f1"), f2.alias("f2"), f3.alias("f3"), "digest").agg(
        F.count("*").alias("total"),
        F.sum(F.col("f1").cast("long")).alias("s1"),
        F.sum(F.col("f2").cast("long")).alias("s2"),
        F.sum(F.col("f3").cast("long")).alias("s3"),
        F.countDistinct(F.when(F.col("f3"), F.col("digest"))).alias("s4"),
    )
    return agg.selectExpr(
        "stack(5, '0_total', total, '1_length', s1, '2_token_len', s2, "
        "'3_repetition', s3, '4_exact_dedup', s4) AS (stage, docs_remaining)"
    ).orderBy("stage")


_QUOTA = 25  # docs per language
_N_SALTS = 8


@register(
    "q103_stratified_sample",
    oracle=f"""
        WITH ranked AS (
          SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               ROUND(AVG(n_chars), 6) AS avg_chars
        FROM ranked WHERE rn <= {_QUOTA}
        GROUP BY lang ORDER BY lang
    """,
    doc="Stratified corpus-mix sampler: a deterministic per-language "
    "quota sample ordered by md5(doc_id) (a seedless uniform shuffle), "
    "reported as per-language sample summaries. Scale shape: `lang` has "
    "tiny cardinality, so a naive window would funnel the corpus through "
    "a handful of partitions; instead phase 1 ranks within (lang, salt) "
    "buckets and keeps quota rows per bucket, phase 2 re-ranks only the "
    "n_salts*quota survivors per language - the classic salted "
    "top-k-per-group decomposition, exactly equal to the single window "
    "because the order key is total.",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
    )
    # Phase 1: per-(lang, salt) quota. Any deterministic function of the
    # row works as the salt; pmod keeps it cheap and uniform.
    salt = F.pmod(F.col("doc_id"), F.lit(_N_SALTS))
    w1 = Window.partitionBy("lang", "salt").orderBy("ord_key", "doc_id")
    survivors = (
        docs.withColumn("salt", salt)
        .withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _QUOTA)
    )
    # Phase 2: true per-language rank over <= n_salts*quota rows/lang.
    w2 = Window.partitionBy("lang").orderBy("ord_key", "doc_id")
    sampled = survivors.withColumn("rn", F.row_number().over(w2)).where(
        F.col("rn") <= _QUOTA
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )
