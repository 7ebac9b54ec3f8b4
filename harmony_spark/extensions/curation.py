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


_SHINGLE_N = 5  # decontamination shingle width (tokens)


@register(
    "q104_decontamination",
    oracle=rf"""
        WITH tok AS (
          SELECT doc_id, source,
                 string_split_regex(lower(text), '\s+') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id, source,
                 unnest(list_transform(range(1, len(toks) - {_SHINGLE_N - 2}),
                        i -> array_to_string(toks[i:i+{_SHINGLE_N - 1}], ' '))) AS shingle
          FROM tok WHERE len(toks) >= {_SHINGLE_N}
        ),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 23 = 0),
        corp AS (SELECT doc_id, source, shingle FROM sh WHERE doc_id % 23 <> 0),
        cont AS (SELECT DISTINCT c.doc_id, c.source
                 FROM corp c JOIN ev USING (shingle)),
        tot AS (SELECT source, COUNT(*) AS n_docs FROM documents
                WHERE doc_id % 23 <> 0 GROUP BY source),
        cc AS (SELECT source, COUNT(*) AS n_cont FROM cont GROUP BY source)
        SELECT t.source,
               CAST(t.n_docs AS BIGINT) AS n_docs,
               CAST(COALESCE(cc.n_cont, 0) AS BIGINT) AS n_contaminated
        FROM tot t LEFT JOIN cc USING (source) ORDER BY t.source
    """,
    doc="Benchmark decontamination: flag training documents that share "
    "any 5-token shingle with the held-out eval set (doc_id % 23 == 0 "
    "plays the eval split), reported as per-source contamination "
    "counts. Scale shape: the eval side deduplicates to a distinct "
    "shingle set and BROADCASTS (eval suites are KB-to-MB against a "
    "100 TB corpus), so the corpus-side shingle explosion joins "
    "map-side with no shuffle of corpus text; the contaminated-doc set "
    "collapses back to distinct doc_ids before the census.",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "doc_id", "source", F.split(F.lower(F.col("text")), r"\s+").alias("toks")
    )
    shingle = F.expr(
        f"transform(sequence(0, size(toks) - {_SHINGLE_N}), "
        f"i -> array_join(slice(toks, i + 1, {_SHINGLE_N}), ' '))"
    )
    sh = (
        docs.where(F.size("toks") >= _SHINGLE_N)
        .select("doc_id", "source", F.explode(shingle).alias("shingle"))
    )
    is_eval = F.col("doc_id") % 23 == 0
    ev = sh.where(is_eval).select("shingle").distinct()
    contaminated = (
        sh.where(~is_eval)
        .join(F.broadcast(ev), "shingle")
        .select("doc_id", "source")
        .distinct()
    )
    tot = (
        docs.where(~is_eval)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    cc = contaminated.groupBy("source").agg(F.count("*").alias("n_cont"))
    return (
        tot.join(cc, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_cont"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .orderBy("source")
    )


_QUOTA = 25  # docs per language


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
    "tiny cardinality, so a rank-then-filter window looks like a skew "
    "trap - but Spark's rank-limit pushdown plans a PARTIAL "
    "WindowGroupLimit before the exchange, keeping top-quota rows per "
    "scan partition map-side, so the per-language exchange carries "
    "O(quota * n_input_partitions) rows, not the corpus. That native "
    "pushdown is exactly the salted two-phase top-k decomposition one "
    "would hand-write (and this module's first draft did); the plan "
    "test pins the Partial WindowGroupLimit so a Spark regression "
    "would surface.",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "lang",
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
    )
    w = Window.partitionBy("lang").orderBy("ord_key", "doc_id")
    sampled = docs.withColumn("rn", F.row_number().over(w)).where(
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
