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


# --- chunk-level (paragraph-equivalent) corpus operators -------------------
#
# The synthetic corpus has no newlines, so the paragraph unit is a fixed
# non-overlapping window of _CHUNK_W tokens — the same unit RefinedWeb /
# Dolma-style pipelines use at the paragraph level and C4 uses at the line
# level. All chunk operators shuffle 16-byte digests + (doc_id, idx)
# coordinates, never chunk text.

_CHUNK_W = 10


def _chunks(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, source, idx, digest) for every non-overlapping _CHUNK_W-token
    chunk; docs shorter than one chunk contribute nothing."""
    docs = table(spark, sf, "documents").select(
        "doc_id", "source", F.split(F.lower(F.col("text")), r"\s+").alias("toks")
    )
    chunk = F.expr(
        f"transform(sequence(0, int(size(toks) / {_CHUNK_W}) - 1), "
        f"i -> array_join(slice(toks, i * {_CHUNK_W} + 1, {_CHUNK_W}), ' '))"
    )
    return (
        docs.where(F.size("toks") >= _CHUNK_W)
        .select("doc_id", "source", F.posexplode(chunk).alias("idx", "chunk"))
        .select("doc_id", "source", "idx", F.md5("chunk").alias("digest"))
    )


_CHUNK_SQL = rf"""
        WITH tok AS (
          SELECT doc_id, source,
                 string_split_regex(lower(text), '\s+') AS toks
          FROM documents
        ),
        ch AS (
          SELECT doc_id, source,
                 unnest(list_transform(range(0, CAST(len(toks) // {_CHUNK_W} AS INT)),
                        i -> {{'idx': i, 'digest': md5(array_to_string(
                              toks[i*{_CHUNK_W}+1:i*{_CHUNK_W}+{_CHUNK_W}], ' '))}})) AS s
          FROM tok WHERE len(toks) >= {_CHUNK_W}
        ),
        chunks AS (SELECT doc_id, source, s.idx AS idx, s.digest AS digest FROM ch)
"""


@register(
    "q105_chunk_dedup",
    oracle=_CHUNK_SQL
    + """
        , ranked AS (
          SELECT doc_id, digest,
                 ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id, idx) AS rn
          FROM chunks
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Paragraph-level (chunk) exact dedup with reassembly accounting "
    "(RefinedWeb/Dolma paragraph dedup; C4 does the same at line level): "
    "each 10-token chunk survives only in its globally-first document "
    "(order by doc_id, idx), and every document reports how many of its "
    "chunks it keeps. Scale shape: the corpus-wide first-occurrence "
    "window partitions by chunk DIGEST (high cardinality — no skew), "
    "and the shuffle carries md5+coordinates, never chunk text.",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    ch = _chunks(spark, sf)
    w = Window.partitionBy("digest").orderBy("doc_id", "idx")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
        )
        .orderBy("doc_id")
    )


_BOILER_MIN_DOCS = 2


@register(
    "q106_boilerplate_removal",
    oracle=_CHUNK_SQL
    + f"""
        , freq AS (
          SELECT digest, COUNT(DISTINCT doc_id) AS n_docs_with
          FROM chunks GROUP BY digest
        ),
        flagged AS (
          SELECT c.doc_id, c.source,
                 (f.n_docs_with >= {_BOILER_MIN_DOCS}) AS boiler
          FROM chunks c JOIN freq f USING (digest)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS total_chunks,
               CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS chunks_removed,
               CAST(COUNT(DISTINCT CASE WHEN boiler THEN doc_id END) AS BIGINT)
                 AS docs_affected
        FROM flagged GROUP BY source ORDER BY source
    """,
    doc="C4-style boilerplate removal census: any 10-token chunk occurring "
    "in >= 2 distinct documents is boilerplate and removed from ALL of "
    "them (C4 removed any line occurring thrice in the crawl; threshold "
    "2 matches this corpus's repetition rate). Per-source attrition "
    "report. Scale shape: the frequency table is a digest-keyed hash "
    "agg with map-side partials; rejoining it to the chunk table is a "
    "digest-equi-join that AQE can broadcast when the boilerplate "
    "vocabulary is small, and the document text itself never shuffles.",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    ch = _chunks(spark, sf)
    freq = ch.groupBy("digest").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    flagged = ch.join(freq, "digest").withColumn(
        "boiler", F.col("n_docs_with") >= _BOILER_MIN_DOCS
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("total_chunks"),
            F.sum(F.col("boiler").cast("long")).alias("chunks_removed"),
            F.countDistinct(F.when(F.col("boiler"), F.col("doc_id"))).alias(
                "docs_affected"
            ),
        )
        .orderBy("source")
    )


_SEQ_BUDGET = 2048  # tokens per packed training sequence
_PACK_SHARD_W = 128  # minimum doc_ids per prefix-sum shard
_PACK_MAX_SHARDS = 4096  # driver-side offset-table bound at ANY corpus size


@register(
    "q107_sequence_packing",
    oracle=rf"""
        WITH t AS (
          SELECT doc_id,
                 len(string_split_regex(lower(text), '\s+')) AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t
        )
        SELECT CAST(cum_before // {_SEQ_BUDGET} AS BIGINT) AS seq_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc
        FROM c GROUP BY seq_id ORDER BY seq_id
    """,
    doc="Token-budget sequence packing for LLM training: documents are "
    "laid out in deterministic doc_id order and cut into 2048-token "
    "training sequences; seq_id = floor(tokens_before_doc / budget) "
    "(greedy contiguous fill, boundary doc overflows into the next "
    "sequence). Scale shape: the global prefix sum is NOT a "
    "single-partition window — it is the classic two-phase distributed "
    "scan: per-shard token totals (a tiny aggregate; the shard width "
    "adapts to the id range so the offset table never exceeds 4096 "
    "rows) are collected and turned into shard offsets, "
    "broadcast back, and each shard computes its local running sum "
    "under Window.partitionBy(shard). The only global data movement is "
    "the shard-total aggregate.",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    base = table(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    # Shard width adapts to the id range so the phase-1 offset table the
    # driver collects is bounded at _PACK_MAX_SHARDS rows at ANY corpus
    # size (a fixed 128-doc width would collect N/128 rows — 400M shard
    # totals on a 50B-doc corpus). The max(doc_id) probe is a one-column
    # scan with map-side combine.
    max_id = base.agg(F.max("doc_id")).collect()[0][0] or 0
    width = max(_PACK_SHARD_W, max_id // _PACK_MAX_SHARDS + 1)
    t = base.withColumn("shard", (F.col("doc_id") / width).cast("long"))
    # Phase 1: shard totals -> driver (one row per 128 docs; bounded) ->
    # exclusive prefix offsets -> tiny broadcast-joined offset table.
    totals = t.groupBy("shard").agg(F.sum("n_tokens").alias("shard_tokens"))
    rows = sorted((r["shard"], r["shard_tokens"]) for r in totals.collect())
    offsets, acc = [], 0
    for shard, tok in rows:
        offsets.append((shard, acc))
        acc += tok
    off = spark.createDataFrame(offsets, "shard long, shard_offset long")
    # Phase 2: in-shard running sum; global position = offset + local.
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        t.join(F.broadcast(off), "shard")
        .withColumn(
            "cum_before",
            F.col("shard_offset") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .withColumn("seq_id", (F.col("cum_before") / _SEQ_BUDGET).cast("long"))
    )
    return (
        c.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("seq_id")
    )


_MIX_TEMP = 0.7  # mixing temperature (UnifiedQA / multilingual-LM style)


@register(
    "q108_domain_mix_weights",
    oracle=rf"""
        WITH d AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
                   AS n_tokens
          FROM documents GROUP BY source
        ),
        s AS (
          SELECT source, n_docs, n_tokens,
                 CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS share,
                 POW(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), {_MIX_TEMP})
                   AS raw_w
          FROM d
        )
        SELECT source, n_docs, n_tokens,
               ROUND(share, 8) AS token_share,
               ROUND(raw_w / SUM(raw_w) OVER (), 8) AS mix_weight,
               ROUND((raw_w / SUM(raw_w) OVER ()) / share, 6) AS oversample
        FROM s ORDER BY source
    """,
    doc="Temperature-based domain mixing weights (multilingual-LM / "
    "data-mixture recipe): per-source token shares are re-weighted by "
    "share^0.7 and renormalized, yielding the sampling weight and the "
    "over/under-sample factor each domain gets in the training mix. "
    "Scale shape: one hash aggregate to 20 domain rows; the "
    "normalizing windows run over that domain-sized table, so the "
    "corpus is scanned exactly once regardless of size.",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+")))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    w_all = Window.partitionBy()
    s = d.withColumn(
        "share", F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all)
    ).withColumn("raw_w", F.pow("share", F.lit(_MIX_TEMP)))
    return (
        s.withColumn("mix_w", F.col("raw_w") / F.sum("raw_w").over(w_all))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("share", 8).alias("token_share"),
            F.round("mix_w", 8).alias("mix_weight"),
            F.round(F.col("mix_w") / F.col("share"), 6).alias("oversample"),
        )
        .orderBy("source")
    )


_N_SHARDS = 16


@register(
    "q109_training_shards",
    oracle=f"""
        WITH s AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                   % {_N_SHARDS} AS shard,
                 len(string_split_regex(lower(text), '\\s+')) AS n_tokens
          FROM documents
        )
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM s GROUP BY shard ORDER BY shard
    """,
    doc="Deterministic global training shuffle: every document is "
    "assigned to one of 16 output shards by md5(doc_id) — a seedless, "
    "engine-independent uniform hash — and the query reports per-shard "
    "balance (doc/token counts + id checksum). This is the reshard "
    "step before writing packed training data: hash assignment means "
    "adjacent source documents land in different shards (the global "
    "shuffle LLM training wants) while staying reproducible across "
    "engines and runs. One aggregate, map-side combinable.",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "documents").select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long")
            % _N_SHARDS
        ).alias("shard"),
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    return (
        s.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("shard_tokens"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("shard")
    )


def _cc_closure_sql(where: str = "") -> str:
    """Recursive-CTE connected components over the LSH edge set (the
    independent closure the dedup funnels verify against): yields
    cc(doc_id, cluster_id) for every document IN the near-dup graph.
    ``where`` restricts the document set the graph is built over (it may
    reference CTEs defined earlier in the enclosing WITH chain)."""
    from harmony_spark.extensions.dedup import _minhash_sig_sql

    return f"""
        sig AS ({_minhash_sig_sql(where)}),
        bands AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sig) x),
        e AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id),
        bi AS (SELECT da AS a, db AS b FROM e
               UNION ALL SELECT db AS a, da AS b FROM e),
        reach(a, b) AS (
          SELECT a, b FROM bi
          UNION
          SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a),
        cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
               FROM reach GROUP BY a)
    """


_SPLIT_EXPR_SQL = (
    "CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END"
)


@register(
    "q117_leakage_free_split",
    oracle=f"""
        WITH RECURSIVE {_cc_closure_sql()},
        grouped AS (
          SELECT d.doc_id, d.source,
                 COALESCE(cc.cluster_id, d.doc_id) AS gkey
          FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        ),
        assigned AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5(CAST(gkey AS VARCHAR)), 1, 4)) AS INT)
                   % 100 AS h
          FROM grouped
        )
        SELECT {_SPLIT_EXPR_SQL} AS split, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM assigned GROUP BY 1, 2 ORDER BY split, source
    """,
    doc="Leakage-free train/val/test split: documents are hashed into "
    "80/10/10 splits BY NEAR-DUP CLUSTER, not individually - two "
    "near-identical documents always land in the same split, so "
    "validation never scores memorized training text. Group key = "
    "connected component of the LSH graph (min doc_id) for grouped "
    "docs, the doc itself otherwise; assignment = md5 of the group "
    "key (engine-independent, seedless, reproducible). Shuffle shape: "
    "CC (logarithmic star rounds) + one digest-keyed left join + one "
    "bounded census aggregate; the oracle replays the split over a "
    "recursive-CTE closure.",
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.extensions.dedup import _lsh_cc
    from harmony_spark.io import table_parallel

    docs = table_parallel(spark, sf, "documents").select("doc_id", "source")
    # shared session-memoized LSH component labelling (_lsh_cc): the
    # full-corpus LSH band build + star-CC rounds run once per session
    # for q75/q117/q118/q224 instead of once per query per run
    cc = _lsh_cc(spark, sf).withColumnRenamed("node", "doc_id")
    h = (
        F.conv(
            F.substring(F.md5(F.col("gkey").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(F.col("h") < 80, "train").when(F.col("h") < 90, "val").otherwise("test")
    )
    return (
        docs.join(cc, "doc_id", "left")
        .withColumn("gkey", F.coalesce("component", "doc_id"))
        .withColumn("h", h)
        .withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("split", "source")
    )


@register(
    "q118_soft_dedup_weights",
    oracle=f"""
        WITH RECURSIVE {_cc_closure_sql()},
        sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM cc GROUP BY cluster_id),
        weighted AS (
          SELECT d.doc_id, d.source,
                 1.0 / COALESCE(s.csize, 1) AS w
          FROM documents d
          LEFT JOIN cc ON cc.doc_id = d.doc_id
          LEFT JOIN sizes s ON s.cluster_id = cc.cluster_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(SUM(w), 6) AS effective_docs
        FROM weighted GROUP BY source ORDER BY source
    """,
    doc="Soft deduplication: instead of dropping near-duplicates, each "
    "document gets sampling weight 1/|near-dup cluster| (singletons "
    "weigh 1.0) - the down-weighting recipe some pretraining mixes "
    "use to keep one effective copy of boilerplate without losing "
    "coverage. Output: per-source doc count vs effective (weighted) "
    "count. Cluster sizes come from one aggregate over the CC labels; "
    "everything else is a digest-keyed join + census.",
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.extensions.dedup import _lsh_cc
    from harmony_spark.io import table_parallel

    docs = table_parallel(spark, sf, "documents").select("doc_id", "source")
    # shared session-memoized LSH component labelling (_lsh_cc): the
    # full-corpus LSH band build + star-CC rounds run once per session
    # for q75/q117/q118/q224 instead of once per query per run
    cc = _lsh_cc(spark, sf).withColumnRenamed("node", "doc_id")
    sizes = cc.groupBy("component").agg(F.count("*").alias("csize"))
    weighted = (
        docs.join(cc, "doc_id", "left")
        .join(F.broadcast(sizes), "component", "left")
        .withColumn("w", F.lit(1.0) / F.coalesce("csize", F.lit(1)))
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("w"), 6).alias("effective_docs"),
        )
        .orderBy("source")
    )


@register(
    "q130_full_curation",
    oracle=f"""
        WITH RECURSIVE
        qsig AS (
          SELECT doc_id, source, n_chars,
                 len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
                 len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS n_distinct
          FROM documents),
        qpass AS (
          SELECT doc_id FROM qsig
          WHERE doc_id % 23 <> 0
            AND n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
            AND CAST(n_chars AS DOUBLE) / n_tokens
                BETWEEN {_MIN_TOK_LEN} AND {_MAX_TOK_LEN}
            AND CAST(n_distinct AS DOUBLE) / n_tokens >= {_MIN_DISTINCT_RATIO}),
        ekept AS (
          SELECT MIN(doc_id) AS doc_id FROM documents
          WHERE doc_id IN (SELECT doc_id FROM qpass) GROUP BY md5(text)),
        {_cc_closure_sql("WHERE doc_id IN (SELECT doc_id FROM ekept)")},
        ndkept AS (
          SELECT e2.doc_id FROM ekept e2 LEFT JOIN cc ON cc.doc_id = e2.doc_id
          WHERE cc.doc_id IS NULL OR cc.cluster_id = e2.doc_id),
        tokd AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                 FROM documents),
        shing AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - {_SHINGLE_N - 2}),
                        i -> array_to_string(toks[i:i+{_SHINGLE_N - 1}], ' '))) AS shingle
          FROM tokd WHERE len(toks) >= {_SHINGLE_N}),
        evs AS (SELECT DISTINCT shingle FROM shing WHERE doc_id % 23 = 0),
        cont AS (SELECT DISTINCT s.doc_id FROM shing s JOIN evs USING (shingle)
                 WHERE s.doc_id IN (SELECT doc_id FROM ndkept)),
        final AS (SELECT doc_id FROM ndkept
                  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        cens AS (
          SELECT q.source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(q.n_tokens) AS BIGINT) AS kept_tokens,
                 CAST(SUM(q.doc_id) AS BIGINT) AS id_checksum
          FROM qsig q JOIN final f ON f.doc_id = q.doc_id
          GROUP BY q.source)
        SELECT source, n_docs, kept_tokens, id_checksum,
               ROUND(CAST(kept_tokens AS DOUBLE) / SUM(kept_tokens) OVER (), 8)
                 AS token_share
        FROM cens ORDER BY source
    """,
    doc="THE end-to-end pretraining-corpus curation pipeline, every stage "
    "composed in one plan: (0) hold out the eval split (doc_id % 23) - "
    "never trains; (1) C4/Gopher quality gate (length window, mean "
    "token length, distinct-token ratio - q102's rule); (2) exact "
    "dedup, min doc_id per md5 (q30/q97 stage); (3) MinHash/LSH "
    "near-dup graph over the survivors + connected components, keeping "
    "each cluster's representative (q97 stage); (4) decontamination - "
    "drop any survivor sharing a 5-token shingle with the eval split "
    "(q104's rule); (5) per-source census with token totals and the "
    "final mix share (q108's input). Scale shape is the union of its "
    "parts, all pinned individually: digest-not-document shuffles for "
    "both dedups, band-bucket-local LSH pair generation, O(log n) "
    "star-CC rounds, broadcast eval shingle set, and one bounded "
    "census aggregate. The DuckDB oracle replays the ENTIRE pipeline "
    "with a recursive-CTE transitive closure standing in for CC - "
    "every stage boundary must agree for the hash to match.",
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.extensions.dedup import _lsh_pairs
    from harmony_spark.io import table_parallel
    from harmony_spark.operators.graph import connected_components

    toks = F.split(F.lower(F.col("text")), r"\s+")
    # base feeds FIVE branches (quality gate, md5 dedup, eval shingles,
    # contamination shingles, final census); the tokenize + distinct
    # projection is the expensive part, so materialize it ONCE (with
    # the token arrays — the shingle stage reuses them instead of
    # re-splitting text) behind a lazy checkpoint.
    base = (
        table_parallel(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            "text",
            "n_chars",
            toks.alias("toks"),
        )
        .select(
            "doc_id",
            "source",
            "text",
            "n_chars",
            "toks",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
        )
        .localCheckpoint(eager=False)
    )
    is_eval = F.col("doc_id") % 23 == 0
    passing = base.where(~is_eval).where(
        F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
        & (F.col("n_chars").cast("double") / F.col("n_tokens")).between(
            _MIN_TOK_LEN, _MAX_TOK_LEN
        )
        & (
            F.col("n_distinct").cast("double") / F.col("n_tokens")
            >= _MIN_DISTINCT_RATIO
        )
    )
    # ekept feeds the two pair semi-joins below, the ndkept join and
    # the final census — one lazy checkpoint
    ekept = (
        passing.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    # Per-doc MinHash signatures are subset-independent, so the LSH
    # pair set over the quality-gated exact-kept docs equals the
    # memoized full-corpus pair set restricted to ekept×ekept (see
    # q97) — two id semi-joins replace the per-call signature + band
    # self-join over the kept text.
    kept_pairs = (
        _lsh_pairs(spark, sf)
        .join(ekept.withColumnRenamed("doc_id", "da"), "da", "semi")
        .join(ekept.withColumnRenamed("doc_id", "db"), "db", "semi")
    )
    cc = connected_components(
        kept_pairs.select(F.col("da").alias("src"), F.col("db").alias("dst"))
    ).withColumnRenamed("node", "doc_id")
    ndkept = (
        ekept.join(cc, "doc_id", "left")
        .where(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
        .select("doc_id")
    )

    def _sh(df: DataFrame) -> DataFrame:
        # reads the materialized toks column — no re-split of text
        expr = F.expr(
            f"transform(sequence(0, size(toks) - {_SHINGLE_N}), "
            f"i -> array_join(slice(toks, i + 1, {_SHINGLE_N}), ' '))"
        )
        return (
            df.select("doc_id", "toks")
            .where(F.size("toks") >= _SHINGLE_N)
            .select("doc_id", F.explode(expr).alias("shingle"))
        )

    ev = _sh(base.where(is_eval)).select("shingle").distinct()
    cont = (
        _sh(base.join(ndkept, "doc_id"))
        .join(F.broadcast(ev), "shingle")
        .select("doc_id")
        .distinct()
    )
    final = ndkept.join(cont, "doc_id", "left_anti")
    cens = (
        base.join(final, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("kept_tokens"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )
    w_all = Window.partitionBy()
    return (
        cens.withColumn(
            "token_share",
            F.round(
                F.col("kept_tokens").cast("double")
                / F.sum("kept_tokens").over(w_all),
                8,
            ),
        )
        .orderBy("source")
    )


_RAGCHUNK_W, _RAGCHUNK_STRIDE = 30, 20


@register(
    "q127_sliding_chunker",
    oracle=rf"""
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
          FROM documents
        ),
        starts AS (
          SELECT doc_id, toks, UNNEST(generate_series(1, len(toks), {_RAGCHUNK_STRIDE})) AS s
          FROM t
        )
        SELECT doc_id,
               CAST((s - 1) / {_RAGCHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(toks[s:s + {_RAGCHUNK_W} - 1]) AS BIGINT) AS n_tokens,
               substr(md5(array_to_string(toks[s:s + {_RAGCHUNK_W} - 1], ' ')), 1, 8) AS chunk_sig
        FROM starts
        WHERE doc_id < 100
        ORDER BY doc_id, chunk_idx
    """,
    doc="RAG sliding-window chunker: fixed token windows "
    f"(w={_RAGCHUNK_W}, stride={_RAGCHUNK_STRIDE}, {_RAGCHUNK_W - _RAGCHUNK_STRIDE}-token "
    "overlap) per document, emitted as (chunk_idx, token count, content "
    "signature) - the chunking contract every retrieval pipeline feeds "
    "its embedder, the overlap preserving cross-boundary context. "
    "Entirely row-local higher-order array ops (sequence -> slice -> "
    "array_join -> md5): zero shuffle until a downstream consumer "
    "aggregates, so it composes with the embedding/index stages at "
    "any corpus size.",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    toks = F.split(F.lower(F.col("text")), r"\s+")
    docs = (
        table(spark, sf, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", toks.alias("toks"))
    )
    starts = docs.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(_RAGCHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice("toks", F.col("s"), F.lit(_RAGCHUNK_W))
    return (
        starts.select(
            "doc_id",
            ((F.col("s") - 1) / _RAGCHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.substring(F.md5(F.array_join(chunk, " ").cast("binary")), 1, 8).alias(
                "chunk_sig"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_WS_K = 200  # weighted sample size (q140)


@register(
    "q140_weighted_sample",
    oracle=f"""
        WITH w AS (
          SELECT doc_id, source,
                 len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  + 1.0) / 4294967297.0 AS u
          FROM documents
        ),
        keyed AS (
          SELECT doc_id, source, n_tokens, ln(u) / n_tokens AS es_key
          FROM w WHERE n_tokens > 0
        ),
        topk AS (
          SELECT * FROM keyed ORDER BY es_key DESC, doc_id LIMIT {_WS_K}
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(n_tokens) AS BIGINT) AS token_sum
        FROM topk GROUP BY source ORDER BY source
    """,
    doc="Deterministic weighted sampling WITHOUT replacement "
    "(Efraimidis-Spirakis A-ES): each document draws a seedless "
    "uniform u from md5(doc_id) and competes on key = ln(u)/weight "
    "(equivalent to u^(1/w)); the global top-200 keys ARE a weighted "
    "sample without replacement - here weight = token count, the "
    "draw a tokenizer/vocab-learning pipeline wants (sample mass "
    "proportional to text mass, reproducible across engines and "
    "runs). Scale shape: one projection + a TakeOrdered top-k "
    "(per-partition heaps, no global sort, no shuffle of losers); "
    "composing with q108's mix weights (w = mix_weight) turns the "
    "same operator into the corpus-mix subsampler.",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    toks = F.size(F.split(F.lower(F.col("text")), r"\s+"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    keyed = (
        table_parallel(spark, sf, "documents")
        .select("doc_id", "source", toks.alias("n_tokens"), u.alias("u"))
        .where(F.col("n_tokens") > 0)
        .withColumn("es_key", F.log("u") / F.col("n_tokens"))
    )
    topk = keyed.orderBy(F.desc("es_key"), "doc_id").limit(_WS_K)
    return (
        topk.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_tokens").cast("long").alias("token_sum"),
        )
        .orderBy("source")
    )


_QN_RATE = 0.8  # per-source quantile cutoff: keep the top 20%


@register(
    "q145_quantile_gate",
    oracle=f"""
        WITH s AS (
          SELECT doc_id, source,
                 CAST(n_chars AS DOUBLE)
                   / len(string_split_regex(lower(text), '\\s+')) AS score
          FROM documents
        ),
        th AS (SELECT source, quantile_cont(score, {_QN_RATE}) AS cutoff
               FROM s GROUP BY source)
        SELECT s.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s.score >= th.cutoff THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               ROUND(th.cutoff, 6) AS cutoff
        FROM s JOIN th USING (source)
        GROUP BY s.source, th.cutoff ORDER BY s.source
    """,
    doc="Per-domain quantile thresholding (rank-normalized quality "
    "gate): every source keeps its own top 20% by quality score, so "
    "domains with incomparable score scales survive at equal rates - "
    "the fairness-across-domains filter a naive global threshold "
    "breaks (it would empty the domain whose scores run low). Scale "
    "shape: the cutoff is ONE exact-percentile aggregate to ~20 "
    "source rows, broadcast back for the gating pass - no "
    "percent_rank window over a low-cardinality partition key (which "
    "would funnel each domain's full corpus through one task); at "
    "extreme group sizes swap percentile for percentile_approx and "
    "keep the identical two-pass plan.",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    score = F.col("n_chars").cast("double") / F.size(
        F.split(F.lower(F.col("text")), r"\s+")
    )
    s = table_parallel(spark, sf, "documents").select(
        "doc_id", "source", score.alias("score")
    )
    th = s.groupBy("source").agg(
        F.percentile("score", F.lit(_QN_RATE)).alias("cutoff")
    )
    return (
        s.join(F.broadcast(th), "source")
        .groupBy("source", "cutoff")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("score") >= F.col("cutoff")).cast("long")).alias("n_kept"),
        )
        .select(
            "source", "n_docs", "n_kept", F.round("cutoff", 6).alias("cutoff")
        )
        .orderBy("source")
    )


@register(
    "q150_corpus_health",
    oracle=rf"""
        WITH sig AS (
          SELECT doc_id, source, lang, md5(text) AS digest,
                 len(string_split_regex(lower(text), '\s+')) AS n_tokens,
                 len(list_distinct(string_split_regex(lower(text), '\s+'))) AS n_distinct,
                 n_chars
          FROM documents
        ),
        wide AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 AVG(CAST(n_distinct AS DOUBLE) / n_tokens) AS mean_distinct_ratio,
                 AVG(CAST(n_chars AS DOUBLE) / n_tokens) AS mean_tok_len,
                 CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
          FROM sig
        ),
        lp AS (SELECT lang, COUNT(*) AS n FROM sig GROUP BY lang),
        ent AS (
          SELECT SUM(- (CAST(n AS DOUBLE) / t.total)
                     * ln(CAST(n AS DOUBLE) / t.total) / ln(2)) AS lang_entropy
          FROM lp, (SELECT SUM(n) AS total FROM lp) t
        )
        SELECT metric, ROUND(value, 6) AS value FROM (
          SELECT '1_n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM wide
          UNION ALL SELECT '2_exact_dup_rate',
                           1.0 - CAST(n_unique AS DOUBLE) / n_docs FROM wide
          UNION ALL SELECT '3_total_tokens', CAST(total_tokens AS DOUBLE) FROM wide
          UNION ALL SELECT '4_mean_distinct_ratio', mean_distinct_ratio FROM wide
          UNION ALL SELECT '5_mean_token_len', mean_tok_len FROM wide
          UNION ALL SELECT '6_n_sources', CAST(n_sources AS DOUBLE) FROM wide
          UNION ALL SELECT '7_lang_entropy_bits', lang_entropy FROM ent
        ) ORDER BY metric
    """,
    doc="The nightly corpus-health dashboard in one pass: size, exact-"
    "duplicate rate, token inventory, repetition (mean distinct-token "
    "ratio), mean token length, source count, and language-diversity "
    "entropy in bits - the numbers a corpus owner tracks release over "
    "release to catch ingest regressions (a crawler loop shows up as "
    "dup-rate and entropy shifts long before eval scores move). "
    "Everything except the language census comes from ONE wide "
    "aggregate over one scan; the entropy windows run over the "
    "~handful of language rows. Emitted as (metric, value) rows - the "
    "shape a metrics store ingests and a catalog snapshot (operators/"
    "catalog.py) versions per release.",
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    toks = F.split(F.lower(F.col("text")), r"\s+")
    sig = table_parallel(spark, sf, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        "n_chars",
    ).localCheckpoint(eager=False)
    wide = sig.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg(F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "mean_distinct_ratio"
        ),
        F.avg(F.col("n_chars").cast("double") / F.col("n_tokens")).alias(
            "mean_tok_len"
        ),
        F.countDistinct("source").alias("n_sources"),
    )
    lp = sig.groupBy("lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    p = F.col("n").cast("double") / F.sum("n").over(w)
    ent = lp.select((-p * F.log2(p)).alias("term")).agg(
        F.sum("term").alias("lang_entropy")
    )
    rows = wide.crossJoin(ent).selectExpr(
        "stack(7, "
        "'1_n_docs', CAST(n_docs AS DOUBLE), "
        "'2_exact_dup_rate', 1.0 - CAST(n_unique AS DOUBLE) / n_docs, "
        "'3_total_tokens', CAST(total_tokens AS DOUBLE), "
        "'4_mean_distinct_ratio', mean_distinct_ratio, "
        "'5_mean_token_len', mean_tok_len, "
        "'6_n_sources', CAST(n_sources AS DOUBLE), "
        "'7_lang_entropy_bits', lang_entropy"
        ") AS (metric, value)"
    )
    return rows.select("metric", F.round("value", 6).alias("value")).orderBy(
        "metric"
    )


_COV_K = 8  # greedy picks


def greedy_coverage_picks(doc_tok: DataFrame, k: int = _COV_K) -> list[tuple[int, int, int]]:
    """Greedy maximum-coverage selection over a (doc_id, tok) pair set:
    k rounds, each picking the document covering the most not-yet-
    covered tokens (ties -> smallest doc_id). Returns
    [(rank, doc_id, marginal_gain)]. Classic (1 - 1/e)-approximate
    submodular maximization — the coverage-driven data-selection
    recipe. Each round is ONE anti-join + ONE aggregate + a 1-row
    collect; the covered-token set is bounded by the vocabulary and
    checkpointed per round."""
    covered = None
    picks: list[tuple[int, int, int]] = []
    for i in range(k):
        remaining = (
            doc_tok
            if covered is None
            else doc_tok.join(covered, "tok", "left_anti")
        )
        top = (
            remaining.groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), "doc_id")
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        d, g = top[0]["doc_id"], top[0]["gain"]
        picks.append((i + 1, int(d), int(g)))
        newly = doc_tok.where(F.col("doc_id") == d).select("tok")
        covered = (
            newly if covered is None else covered.unionByName(newly).distinct()
        ).localCheckpoint(eager=False)
    return picks


def _coverage_oracle(k: int = _COV_K) -> str:
    """Unrolled greedy-coverage rounds as chained CTEs (the same unroll
    choice as the PageRank/BFS/HITS oracles): round i's gains exclude
    the tokens covered by picks 1..i-1, the pick is the (gain DESC,
    doc_id ASC) argmax, and rounds whose gain pool is empty simply
    contribute no row — matching the Spark loop's early break."""
    parts = [
        r"""dd AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
    FROM documents)
  WHERE tok <> ''
),
v AS (SELECT COUNT(DISTINCT tok) AS vs FROM dd),
g1 AS (SELECT doc_id, COUNT(*) AS gain FROM dd GROUP BY doc_id),
p1 AS (SELECT 1 AS r, doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
c1 AS (SELECT DISTINCT tok FROM dd WHERE doc_id = (SELECT doc_id FROM p1))"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""g{i} AS (SELECT doc_id, COUNT(*) AS gain FROM dd
  WHERE tok NOT IN (SELECT tok FROM c{i - 1}) GROUP BY doc_id),
p{i} AS (SELECT {i} AS r, doc_id, gain FROM g{i}
  ORDER BY gain DESC, doc_id LIMIT 1),
c{i} AS (SELECT tok FROM c{i - 1}
  UNION SELECT tok FROM dd WHERE doc_id = (SELECT doc_id FROM p{i}))"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
allp AS ({union})
SELECT CAST(r AS BIGINT) AS pick_rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gain AS BIGINT) AS marginal_gain,
       CAST(SUM(gain) OVER (ORDER BY r) AS BIGINT) AS cumulative_coverage,
       ROUND(SUM(gain) OVER (ORDER BY r) / (SELECT vs FROM v), 6)
         AS coverage_frac
FROM allp ORDER BY pick_rank"""
    )


@register(
    "q154_greedy_coverage",
    oracle=_coverage_oracle(),  # unrolled rounds (bounded K=8); the
    # exact Python-replica test (tests/test_extensions.py) stays as a
    # second, SQL-independent gate on every pick
    doc="Coverage-driven data selection (greedy maximum coverage, the "
    "(1-1/e)-approximate submodular recipe): pick 8 documents that "
    "together cover the most distinct vocabulary - the data-efficient "
    "subset selection used to seed tokenizers, eval suites, and "
    "annotation batches. Each greedy round is one anti-join against "
    "the covered-token set (vocabulary-bounded, checkpointed) plus "
    "one marginal-gain aggregate and a 1-row collect - the same "
    "bounded-driver-state loop discipline as k-means. At 100 TB the "
    "candidate pool is pre-filtered to the top-N docs by individual "
    "coverage (one aggregate) before the rounds. Output: pick rank, "
    "doc, marginal gain, cumulative coverage and coverage fraction "
    "of the full vocabulary. Deterministic (ties break on doc_id); "
    "an exact Python replica pins every pick.",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    doc_tok = (
        table_parallel(spark, sf, "documents")
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))).alias(
                "tok"
            ),
        )
        .where(F.col("tok") != "")
        .localCheckpoint(eager=False)
    )
    vocab_size = doc_tok.select("tok").distinct().count()
    picks = greedy_coverage_picks(doc_tok)
    cum = 0
    rows = []
    for rank, d, g in picks:
        cum += g
        rows.append((rank, d, g, cum, round(cum / vocab_size, 6)))
    return spark.createDataFrame(
        rows,
        "pick_rank long, doc_id long, marginal_gain long, "
        "cumulative_coverage long, coverage_frac double",
    )


@register(
    "q160_token_gini",
    oracle=r"""
        WITH d AS (
          SELECT doc_id, source,
                 len(string_split_regex(lower(text), '\s+')) AS x
          FROM documents
        ),
        r AS (
          SELECT source, x,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY x, doc_id) AS i
          FROM d
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(x) AS BIGINT) AS token_sum,
               ROUND(2.0 * SUM(CAST(i AS DOUBLE) * x)
                     / (COUNT(*) * SUM(x))
                     - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
        FROM r GROUP BY source ORDER BY source
    """,
    doc="Token-mass concentration per source (Gini coefficient over "
    "document lengths): gini near 0 means evenly sized documents, "
    "near 1 means a few giant documents carry the source's whole "
    "token mass - the ingest smell (one concatenated dump file, a "
    "crawler stuck on a mega-page) that mean document length hides. "
    "Computed by the rank formulation G = 2*sum(i*x_(i))/(n*sum(x)) "
    "- (n+1)/n: one source-keyed ranking window (entities sort "
    "within their own partition - no global sort) and one census "
    "aggregate. Pairs with q150's dashboard as a per-source drill-"
    "down.",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = table_parallel(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("x"),
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    r = d.withColumn("i", F.row_number().over(w))
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("x").cast("long").alias("token_sum"),
            F.round(
                2.0
                * F.sum(F.col("i").cast("double") * F.col("x"))
                / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1.0) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("source")
    )


_MIX_ALPHA = 0.7  # temperature exponent (alpha < 1 upweights small sources)
_MIX_BUDGET = 1_000_000  # sampled-token budget the weights allocate


@register(
    "q169_temperature_mix",
    oracle=rf"""
        WITH m AS (
          SELECT source,
                 CAST(SUM(len(string_split_regex(lower(text), '\s+')))
                      AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        w AS (
          SELECT source, n_tokens,
                 POW(n_tokens, {_MIX_ALPHA})
                   / SUM(POW(n_tokens, {_MIX_ALPHA})) OVER () AS wt
          FROM m
        )
        SELECT source, n_tokens,
               ROUND(wt, 6) AS mix_weight,
               ROUND(wt * {_MIX_BUDGET} / n_tokens, 6) AS epochs
        FROM w ORDER BY source
    """,
    doc="Temperature-scaled sampling mix (the multilingual-training "
    "recipe: p_s^alpha renormalized, alpha=0.7): small sources are "
    "upweighted relative to their raw token share, and the per-source "
    "expected EPOCH count at a fixed token budget (weight*budget/"
    "mass) makes over-sampling visible before training does - "
    "epochs >> 1 on a tiny source means it will be memorized. Plan "
    "shape: one source-keyed token census, then the temperature "
    "algebra runs on the |sources|-row summary via an unpartitioned "
    "window over that tiny table - corpus cost is the census scan "
    "alone. Composes with q140 (weighted sampling executes this "
    "mix) and q108's mix shares.",
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    m = (
        table_parallel(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+")))
            .cast("long")
            .alias("n_tokens")
        )
    )
    w_all = Window.partitionBy()
    wt = F.pow("n_tokens", F.lit(_MIX_ALPHA)) / F.sum(
        F.pow("n_tokens", F.lit(_MIX_ALPHA))
    ).over(w_all)
    return m.select(
        "source",
        "n_tokens",
        F.round(wt, 6).alias("mix_weight"),
        F.round(wt * _MIX_BUDGET / F.col("n_tokens"), 6).alias("epochs"),
    ).orderBy("source")


# per-language keep rates: downsample the dominant language, keep the rest
_STRAT_RATES = {"en": 0.25, "fr": 0.75, "es": 0.75, "de": 0.75, "zh": 0.75}
_STRAT_DEFAULT = 1.0


def _strat_rate_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_STRAT_RATES.items())
    )
    return f"CASE lang {cases} ELSE {_STRAT_DEFAULT} END"


@register(
    "q170_stratified_sample",
    oracle=f"""
        WITH u AS (
          SELECT doc_id, lang,
                 {_strat_rate_sql()} AS rate,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) + 1.0) / 4294967297.0 AS u
          FROM documents
        )
        SELECT lang,
               ROUND(MAX(rate), 2) AS rate,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN u < rate THEN doc_id ELSE 0 END) AS BIGINT)
                 AS kept_id_checksum
        FROM u GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic stratified sampling: per-language keep rates "
    "(downsample the dominant 'en' stratum, keep the tails) decided "
    "by a seedless md5(doc_id) uniform - the same hash-uniform as "
    "q140, so the SAMPLE ITSELF is reproducible across engines, "
    "runs, and partitionings, which Spark's df.sampleBy (seeded RNG "
    "per partition) cannot promise. The kept-id checksum pins the "
    "exact membership, not just the counts. Plan shape: pure "
    "projection + one bounded groupBy - no shuffle of losers, no "
    "two-pass count-then-sample; rebalancing a 100 TB corpus is one "
    "scan.",
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    rate = F.lit(_STRAT_DEFAULT)
    for k, v in sorted(_STRAT_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    d = table_parallel(spark, sf, "documents").select(
        "doc_id", "lang", rate.alias("rate"), u.alias("u")
    )
    kept = F.when(F.col("u") < F.col("rate"), 1).otherwise(0)
    return (
        d.groupBy("lang")
        .agg(
            F.round(F.max("rate"), 2).alias("rate"),
            F.count("*").cast("long").alias("n_total"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(
                F.when(F.col("u") < F.col("rate"), F.col("doc_id")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("kept_id_checksum"),
        )
        .orderBy("lang")
    )


@register(
    "q191_ks_two_sample",
    oracle=r"""
        WITH s AS (
          SELECT source,
                 len(string_split_regex(lower(text), '\s+')) AS x
          FROM documents WHERE source IN ('src0', 'src1')
        ),
        v AS (
          SELECT x,
                 SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
                 SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
          FROM s GROUP BY x
        ),
        n AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM v),
        e AS (
          SELECT SUM(c0) OVER (ORDER BY x) AS cum0,
                 SUM(c1) OVER (ORDER BY x) AS cum1
          FROM v
        )
        SELECT CAST(n.n0 AS BIGINT) AS n0,
               CAST(n.n1 AS BIGINT) AS n1,
               ROUND(MAX(ABS(CAST(cum0 AS DOUBLE) / n.n0
                             - CAST(cum1 AS DOUBLE) / n.n1)), 6) AS ks_d
        FROM e, n GROUP BY n.n0, n.n1
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the document-"
    "length distributions of two sources: D = max |ECDF0 - ECDF1| "
    "evaluated at every distinct length — the distribution-drift "
    "detector that catches shape changes a mean/variance check "
    "misses (the nonparametric companion to q111's KL drift, which "
    "needs binning; KS does not). Exactness: cumulative counts are "
    "exact integers, one double division per side per step. Plan "
    "shape: the corpus collapses to one row per DISTINCT length in "
    "a single aggregate; the ECDF running sums come from the "
    "two-phase sharded scan (dist_rank.with_global_order_stats), "
    "so even a wide value domain never funnels through one task.",
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    s = (
        table_parallel(spark, sf, "documents")
        .where(F.col("source").isin("src0", "src1"))
        .select(
            "source",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("x"),
        )
    )
    v = s.groupBy("x").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
    )
    from harmony_spark.operators.dist_rank import with_global_order_stats

    stats, totals = with_global_order_stats(
        v, "x", sum_cols={"c0": "cum0", "c1": "cum1"}
    )
    e = stats.select(
        "cum0",
        "cum1",
        F.lit(totals["c0"]).cast("long").alias("n0"),
        F.lit(totals["c1"]).cast("long").alias("n1"),
    )
    return (
        e.groupBy("n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum0").cast("double") / F.col("n0")
                        - F.col("cum1").cast("double") / F.col("n1")
                    )
                ),
                6,
            ).alias("ks_d")
        )
        .select(
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            "ks_d",
        )
    )


_WILSON_Z = 1.96  # 95% interval


@register(
    "q192_wilson_intervals",
    oracle=f"""
        WITH assign AS (
          SELECT user_id,
                 CASE WHEN (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) + 1.0) / 4294967297.0 < 0.5
                      THEN 'A' ELSE 'B' END AS arm,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 14
                      THEN 1 ELSE 0 END AS converted
          FROM events GROUP BY user_id
        ),
        s AS (
          SELECT arm, COUNT(*) AS n, SUM(converted) AS k FROM assign
          GROUP BY arm
        )
        SELECT arm,
               CAST(n AS BIGINT) AS n,
               CAST(k AS BIGINT) AS k,
               ROUND((CAST(k AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                      - {_WILSON_Z} * SQRT((CAST(k AS DOUBLE) / n)
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                     / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_lo,
               ROUND((CAST(k AS DOUBLE) / n + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
                      + {_WILSON_Z} * SQRT((CAST(k AS DOUBLE) / n)
                          * (1.0 - CAST(k AS DOUBLE) / n) / n
                          + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
                     / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_hi
        FROM s ORDER BY arm
    """,
    doc="Wilson score 95% confidence intervals for each experiment "
    "arm's conversion rate (same hash-assigned arms and >=14-purchase "
    "conversion as q172): the interval that stays inside [0,1] and "
    "behaves at small n and extreme rates, where the naive Wald "
    "interval collapses — non-overlapping Wilson intervals are the "
    "decision-maker's view of q172's z-score. All counts exact; the "
    "interval is a closed-form double expression per arm. Plan "
    "shape: one user-keyed aggregate, one 2-row census.",
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    assign = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
        .withColumn("arm", F.when(u < 0.5, "A").otherwise("B"))
    )
    s = assign.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    z = _WILSON_Z
    p = F.col("k").cast("double") / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    half = z * F.sqrt(
        p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1.0 + z * z / F.col("n")
    return s.select(
        "arm",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("arm")


_ZIPF_FMIN = 5  # Hill-estimator tail cutoff


@register(
    "q193_zipf_alpha",
    oracle=rf"""
        WITH freq AS (
          SELECT w, COUNT(*) AS f FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents) t
          GROUP BY w
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tail_words,
               CAST(SUM(f) AS BIGINT) AS tail_mass,
               ROUND(1.0 + COUNT(*)
                     / SUM(LN(CAST(f AS DOUBLE) / {_ZIPF_FMIN})), 6)
                 AS alpha_hat
        FROM freq WHERE f >= {_ZIPF_FMIN} * 2
    """,
    doc="Zipf tail exponent via the Hill estimator: alpha = 1 + "
    "n/sum(ln(f/f_min)) over word frequencies in the tail (f >= "
    "2*f_min, the standard guard that the cutoff sits inside the "
    "power-law regime) — quantifies HOW heavy the q176 coverage "
    "curve's tail is (alpha near 2 = classic Zipf; larger = thin "
    "tail, a small tokenizer vocab suffices). Plan shape: one "
    "exploded word census with map-side combine, then a single "
    "reduction over the |tail vocab| rows; the ln-sum is the only "
    "double accumulation and is round-6 stable.",
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    freq = (
        table_parallel(spark, sf, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .where(F.col("f") >= _ZIPF_FMIN * 2)
    )
    return freq.agg(
        F.count("*").cast("long").alias("n_tail_words"),
        F.sum("f").cast("long").alias("tail_mass"),
        F.round(
            1.0
            + F.count("*")
            / F.sum(F.log(F.col("f").cast("double") / _ZIPF_FMIN)),
            6,
        ).alias("alpha_hat"),
    )


@register(
    "q197_quantile_normalization",
    oracle=r"""
        WITH d AS (
          SELECT doc_id, source,
                 len(string_split_regex(lower(text), '\s+')) AS x
          FROM documents
        ),
        pooled AS (
          SELECT x AS pooled_x,
                 ROW_NUMBER() OVER (ORDER BY x, doc_id) AS idx,
                 COUNT(*) OVER () AS n
          FROM d
        ),
        ranked AS (
          SELECT source, x,
                 CAST(ROUND((PERCENT_RANK() OVER (PARTITION BY source
                                                  ORDER BY x, doc_id))
                            * ((SELECT MAX(n) FROM pooled) - 1)) AS BIGINT)
                   + 1 AS target_idx
          FROM d
        )
        SELECT r.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(p.pooled_x - r.x) AS BIGINT) AS total_shift,
               CAST(MAX(ABS(p.pooled_x - r.x)) AS BIGINT) AS max_shift
        FROM ranked r JOIN pooled p ON p.idx = r.target_idx
        GROUP BY r.source ORDER BY r.source
    """,
    doc="Quantile normalization across sources: every document's "
    "length is mapped to the POOLED distribution's value at the same "
    "quantile rank (the microarray-normalization classic, here the "
    "length-rebalancing transform for mixing corpora whose document-"
    "size distributions differ) — the census reports how much each "
    "source's mass must shift (exact integer token deltas). "
    "Determinism: ranks use (value, doc_id) tiebreaks and the target "
    "index is an exact integer round of percent_rank*(N-1), so the "
    "rank join is an equi join on integers — no interpolation "
    "ambiguity. Plan shape: BOTH rankings (pooled and per-source) "
    "are the two-phase sharded row_number (dist_rank."
    "with_global_rank, the per-source one partitioned by source "
    "with per-group offsets), then an integer-keyed join — no "
    "single-task window at any step.",
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = table_parallel(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("x"),
    ).localCheckpoint(eager=False)
    from harmony_spark.operators.dist_rank import with_global_rank

    # the shared input is checkpointed (fan-out), so its plan hash is
    # unstable — the explicit stats_token keeps the (bounds, counts)
    # cache warm across repeated runs
    pooled0, n_total = with_global_rank(
        d, "x", ("doc_id",), out="idx", stats_token=("q197", sf)
    )
    pooled = pooled0.select(F.col("x").alias("pooled_x"), "idx")
    # per-source percent_rank from the sharded per-source row_number:
    # percent_rank = (rn - 1) / (n_src - 1), n_src attached by the helper
    ranked0, _ = with_global_rank(
        d,
        "x",
        ("doc_id",),
        partition_by=("source",),
        out="rn_src",
        count_col="n_src",
        stats_token=("q197", sf),
    )
    pr = F.when(F.col("n_src") == 1, F.lit(0.0)).otherwise(
        (F.col("rn_src") - 1) / (F.col("n_src") - 1)
    )
    ranked = ranked0.select(
        "source",
        "x",
        (F.round(pr * (n_total - 1)).cast("long") + 1).alias("target_idx"),
    )
    return (
        ranked.join(
            pooled.select("idx", "pooled_x"),
            ranked["target_idx"] == pooled["idx"],
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("pooled_x") - F.col("x")).cast("long").alias(
                "total_shift"
            ),
            F.max(F.abs(F.col("pooled_x") - F.col("x")))
            .cast("long")
            .alias("max_shift"),
        )
        .orderBy("source")
    )



@register(
    "q199_weighted_median",
    oracle=r"""
        WITH d AS (
          SELECT source,
                 len(string_split_regex(lower(text), '\s+')) AS x
          FROM documents
        ),
        g AS (
          SELECT source, x, COUNT(*) AS w FROM d GROUP BY source, x
        ),
        c AS (
          SELECT source, x, w,
                 SUM(w) OVER (PARTITION BY source ORDER BY x) AS cum,
                 SUM(w) OVER (PARTITION BY source) AS total
          FROM g
        ),
        m AS (
          SELECT source, MIN(x) AS wmedian
          FROM c WHERE cum * 2 >= total GROUP BY source
        )
        SELECT m.source,
               CAST(m.wmedian AS BIGINT) AS token_weighted_median,
               CAST(t.total AS BIGINT) AS n_docs
        FROM m JOIN (SELECT source, MAX(total) AS total FROM c
                     GROUP BY source) t ON t.source = m.source
        ORDER BY m.source
    """,
    doc="Weighted median document length per source (weight = "
    "multiplicity; the first value whose cumulative weight crosses "
    "half the total) — the positional statistic that, unlike "
    "quantile_cont interpolation, is ALWAYS one of the observed "
    "values and therefore hash-stable across engines with no "
    "rounding contract at all. Generalizes directly to any weight "
    "column (token mass, mix weight). Plan shape: the corpus "
    "collapses to (source, value, weight) in one aggregate; the "
    "crossing scan is a cumulative window over that distinct-value "
    "table — the same two-phase exact-selection discipline as "
    "q156's global median, done per group in one pass.",
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = table_parallel(spark, sf, "documents").select(
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("x"),
    )
    g = d.groupBy("source", "x").agg(F.count("*").alias("w"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select(
        "source",
        "x",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(Window.partitionBy("source")).alias("total"),
    )
    return (
        c.where(F.col("cum") * 2 >= F.col("total"))
        .groupBy("source")
        .agg(
            F.min("x").cast("long").alias("token_weighted_median"),
            F.max("total").cast("long").alias("n_docs"),
        )
        .orderBy("source")
    )



_DSIR_BUCKETS = 256
_DSIR_K = 20


@register(
    "q252_dsir_selection",
    oracle=rf"""
        WITH tok0 AS (
          SELECT doc_id, lang,
                 unnest(string_split_regex(lower(text), '\s+')) AS t
          FROM documents
        ),
        tok AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT)
                   % {_DSIR_BUCKETS} AS b
          FROM tok0
        ),
        tc AS (SELECT b, COUNT(*) AS c FROM tok WHERE lang = 'en' GROUP BY b),
        rc AS (SELECT b, COUNT(*) AS c FROM tok GROUP BY b),
        tt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
        rt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rc),
        wt AS (
          SELECT rc.b,
                 ln((COALESCE(tc.c, 0) + 1.0) / (tt.n + {_DSIR_BUCKETS}))
                   - ln((rc.c + 1.0) / (rt.n + {_DSIR_BUCKETS})) AS w
          FROM rc LEFT JOIN tc ON tc.b = rc.b
          CROSS JOIN tt CROSS JOIN rt
        ),
        sc AS (
          SELECT t.doc_id, AVG(w.w) AS s
          FROM tok t JOIN wt w ON w.b = t.b
          GROUP BY t.doc_id
        )
        SELECT d.doc_id, d.source, d.lang, ROUND(s.s, 4) AS dsir_score
        FROM sc s JOIN documents d ON d.doc_id = s.doc_id
        ORDER BY ROUND(s.s, 4) DESC, d.doc_id
        LIMIT {_DSIR_K}
    """,
    doc="Data Selection via Importance Resampling (DSIR, Xie et al. "
    "2023) with hashed unigram features: every token hashes into one "
    f"of {_DSIR_BUCKETS} md5 buckets, the TARGET distribution is fit "
    "on the lang='en' slice and the RAW distribution on the whole "
    "corpus (both add-1 smoothed), each bucket carries the log "
    "importance ratio ln(p_target/p_raw), and a document's score is "
    "its mean per-token ratio — the top-k documents are the ones a "
    "target-matched pretraining mix admits first. The practical "
    "selection step between q108's fixed mix weights and q140's "
    "weighted sampler. Scale shape: the feature space is CLOSED at "
    f"{_DSIR_BUCKETS} buckets regardless of vocabulary, so both "
    "distribution fits are map-side-combinable counts, the weight "
    "table broadcasts back onto the exploded corpus, and per-doc "
    "scoring is one (doc_id)-keyed average — no vocabulary-sized "
    "state anywhere, the property that makes DSIR run where a full "
    "LM-perplexity filter cannot. Determinism: ranking on the "
    "ROUNDED 4-dp score with doc_id tiebreak.",
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    tok = table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("t"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    tc = tok.where(F.col("lang") == "en").groupBy("b").agg(
        F.count("*").alias("tc")
    )
    rc = tok.groupBy("b").agg(F.count("*").alias("rc"))
    tt = tc.agg(F.sum("tc").alias("tn"))
    rt = rc.agg(F.sum("rc").alias("rn"))
    wt = (
        rc.join(tc, "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + 1.0)
                    / (F.col("tn") + _DSIR_BUCKETS)
                )
                - F.log((F.col("rc") + 1.0) / (F.col("rn") + _DSIR_BUCKETS))
            ).alias("w"),
        )
    )
    sc = (
        tok.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(F.round(F.avg("w"), 4).alias("dsir_score"))
    )
    docs = table(spark, sf, "documents").select("doc_id", "source", "lang")
    return (
        sc.join(docs, "doc_id")
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(_DSIR_K)
        .select("doc_id", "source", "lang", "dsir_score")
    )


@register(
    "q257_k_anonymity",
    oracle="""
        WITH qi AS (
          SELECT c_nationkey AS nk, c_mktsegment AS seg,
                 CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
          FROM customer
        ),
        cls AS (
          SELECT nk, seg, band, COUNT(*) AS sz FROM qi GROUP BY nk, seg, band
        )
        SELECT CAST(SUM(sz) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT)
                 AS n_below2,
               CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
                 AS n_below5,
               CAST(SUM(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
                 AS n_below10,
               ROUND(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1.0
                     / SUM(sz), 6) AS risk5_share
        FROM cls
    """,
    doc="k-anonymity census over the quasi-identifier tuple "
    "(nationality, market segment, $1000 balance band): equivalence-"
    "class sizes and the number/share of records in classes below "
    "k = 2/5/10 — the re-identification risk audit a privacy review "
    "runs BEFORE a dataset ships, and the governance complement to "
    "q155's direct-identifier PII census (a record can be clean of "
    "direct PII and still unique on its quasi-identifiers, which is "
    "what actually re-identifies people in released data). The "
    "generalization ladder is explicit: widen a band or drop a "
    "column until the below-k mass hits policy. Scale shape: one "
    "map-side-combinable hash aggregate to the class census, then a "
    "single-row reduction over the census — no per-record state "
    "survives the first aggregate. Determinism: all-integer with "
    "one final share division; the balance banding uses FLOOR on "
    "the identical IEEE doubles both engines read from parquet.",
)
def q257(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    qi = table_parallel(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    cls = qi.groupBy("nk", "seg", "band").agg(F.count("*").alias("sz"))
    below = lambda k: F.sum(  # noqa: E731
        F.when(F.col("sz") < k, F.col("sz")).otherwise(0)
    )
    return cls.agg(
        F.sum("sz").cast("long").alias("n_customers"),
        F.count("*").cast("long").alias("n_classes"),
        below(2).cast("long").alias("n_below2"),
        below(5).cast("long").alias("n_below5"),
        below(10).cast("long").alias("n_below10"),
        F.round(below(5) / F.sum("sz"), 6).alias("risk5_share"),
    )


_NEY_BUDGET = 200


@register(
    "q266_neyman_allocation",
    oracle=f"""
        WITH mom AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(n_chars) AS BIGINT) AS s1,
                 CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
          FROM documents GROUP BY source
        ),
        w AS (
          SELECT source, n,
                 SQRT((n * s2 - s1 * s1) * 1.0) / n AS sd,
                 n * (SQRT((n * s2 - s1 * s1) * 1.0) / n) AS wgt
          FROM mom
        ),
        tot AS (SELECT SUM(wgt) AS tw FROM w),
        alloc0 AS (
          SELECT source, n, sd,
                 CAST(FLOOR(wgt * {_NEY_BUDGET} / tw) AS BIGINT) AS base,
                 wgt * {_NEY_BUDGET} / tw
                   - FLOOR(wgt * {_NEY_BUDGET} / tw) AS rem
          FROM w CROSS JOIN tot
        ),
        lk AS (
          SELECT source, n, sd, base, rem,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
                 SUM(base) OVER () AS sbase
          FROM alloc0
        )
        SELECT source, CAST(n AS BIGINT) AS n_docs, ROUND(sd, 6) AS sd_chars,
               CAST(base + CASE WHEN rr <= {_NEY_BUDGET} - sbase
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM lk ORDER BY source
    """,
    doc=f"Neyman-optimal stratified sample allocation: a {_NEY_BUDGET}-"
    "item annotation/eval budget split across sources proportional "
    "to N_h * sd_h (stratum size times within-stratum length "
    "spread) — the survey-sampling answer to 'which domains deserve "
    "labeling budget', where proportional allocation (q108/q169) "
    "over-samples big uniform strata and under-samples small "
    "variable ones. Integerized by largest-remainder rounding so "
    "the allocations sum EXACTLY to the budget. Scale shape: one "
    "map-side-combinable moment aggregate (n, sum, sum-of-squares "
    "as exact BIGINTs) to the stratum census; everything after is "
    "census-sized. Cross-engine determinism is arithmetic-only: sd "
    "comes from integer moments through sqrt and division (both "
    "IEEE correctly-rounded — no libm transcendentals), so floors "
    "and remainder ranks agree bit-for-bit.",
)
def q266(spark: SparkSession, sf: str) -> DataFrame:
    mom = (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("s1"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
        )
    )
    w = mom.select(
        "source",
        "n",
        (
            F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) * 1.0)
            / F.col("n")
        ).alias("sd"),
    ).withColumn("wgt", F.col("n") * F.col("sd"))
    tot = w.agg(F.sum("wgt").alias("tw"))
    alloc0 = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "sd",
        F.floor(F.col("wgt") * _NEY_BUDGET / F.col("tw")).alias("base"),
        (
            F.col("wgt") * _NEY_BUDGET / F.col("tw")
            - F.floor(F.col("wgt") * _NEY_BUDGET / F.col("tw"))
        ).alias("rem"),
    )
    lk = alloc0.select(
        "source",
        "n",
        "sd",
        "base",
        F.row_number().over(Window.orderBy(F.desc("rem"), "source")).alias("rr"),
        F.sum("base").over(Window.partitionBy()).alias("sbase"),
    )
    return lk.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round("sd", 6).alias("sd_chars"),
        (
            F.col("base")
            + F.when(F.col("rr") <= _NEY_BUDGET - F.col("sbase"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    ).orderBy("source")


_DP_EPS = 1.0


@register(
    "q279_dp_noisy_counts",
    oracle=f"""
    WITH cnt AS (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM customer GROUP BY nk
    ),
    noise AS (
      SELECT nk, true_count,
             (CAST(('0x' || substr(md5('dp-' || CAST(nk AS VARCHAR)), 1, 8))
                   AS BIGINT) + 1.0) / 4294967297.0 AS u
      FROM cnt
    )
    SELECT nk,
           true_count,
           ROUND(true_count
                 - (1.0 / {_DP_EPS})
                   * (CASE WHEN u >= 0.5 THEN 1 ELSE -1 END)
                   * ln(1.0 - 2.0 * ABS(u - 0.5)), 4) AS noisy_count,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon
    FROM noise ORDER BY nk
""",
    doc=f"Epsilon-differentially-private release of per-nation "
    "customer counts (epsilon = {e}, sensitivity 1): Laplace noise "
    "via the inverse-CDF transform of a seedless md5 uniform keyed "
    "on the released cell — both engines draw the IDENTICAL noise, "
    "which is what makes a DP release oracle-checkable at all (a "
    "production release would key the uniform on a secret salt; the "
    "mechanism, sensitivity accounting, and plan are unchanged). "
    "Completes the privacy pair with q257: k-anonymity audits the "
    "RAW data's re-identification risk, the DP mechanism makes the "
    "released AGGREGATE safe regardless of attacker side knowledge. "
    "Scale shape: one map-side-combinable count + a per-cell "
    "projection — noise cost is O(cells), never O(rows).".format(
        e=_DP_EPS
    ),
)
def q279(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    cnt = (
        table_parallel(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp-"), F.col("nk").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    noise = cnt.withColumn("u", u)
    lap = (
        (1.0 / _DP_EPS)
        * F.when(F.col("u") >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(F.col("u") - 0.5))
    )
    return noise.select(
        "nk",
        "true_count",
        F.round(F.col("true_count") - lap, 4).alias("noisy_count"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("nk")


@register(
    "q294_l_diversity",
    oracle="""
        WITH lab AS (
          SELECT c_nationkey AS nk, c_mktsegment AS seg,
                 CASE WHEN c_acctbal < 0 THEN 'neg'
                      WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS sens
          FROM customer
        ),
        g AS (
          SELECT nk, seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT sens) AS BIGINT) AS l
          FROM lab GROUP BY nk, seg
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(l) AS BIGINT) AS min_l,
               CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS groups_below_3,
               CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
                 AS rows_at_risk
    FROM g
    """,
    doc="l-diversity audit over the (nation, segment) quasi-identifier "
    "groups with account-balance tercile as the sensitive attribute: "
    "a k-anonymous group (q257) can still leak if every member "
    "shares the sensitive value, so the release gate is min distinct "
    "sensitive values per QI group — reported as the corpus minimum, "
    "the count of groups below l=3, and the rows exposed in them. "
    "Completes the privacy family: k-anonymity (q257) bounds "
    "re-identification, l-diversity bounds attribute disclosure, DP "
    "noisy counts (q279) bound aggregate leakage. Plan shape: one "
    "QI-keyed census with a distinct-count (partial aggregation "
    "both stages), then a 1-row audit aggregate — all integers.",
)
def q294(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    lab = table_parallel(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("sens"),
    )
    g = lab.groupBy("nk", "seg").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("sens").cast("long").alias("l"),
    )
    return g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("groups_below_3"),
        F.sum(F.when(F.col("l") < 3, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )


_TC_BUCKET = 2000


@register(
    "q324_t_closeness",
    oracle=f"""
        WITH lab AS (
          SELECT c_nationkey AS nk, c_mktsegment AS seg,
                 CAST(FLOOR(c_acctbal / {_TC_BUCKET}) AS BIGINT) AS b
          FROM customer
        ),
        gtot AS (SELECT COUNT(*) AS n FROM lab),
        gdist AS (
          SELECT b, COUNT(*) * 1.0 / (SELECT n FROM gtot) AS g
          FROM lab GROUP BY b
        ),
        classes AS (
          SELECT nk, seg, COUNT(*) AS n_class FROM lab GROUP BY nk, seg
        ),
        grid AS (
          SELECT c.nk, c.seg, c.n_class, d.b, d.g
          FROM classes c CROSS JOIN gdist d
        ),
        cdist AS (
          SELECT nk, seg, b, COUNT(*) AS cnt FROM lab GROUP BY nk, seg, b
        ),
        diff AS (
          SELECT g.nk, g.seg, g.n_class, g.b,
                 COALESCE(c.cnt, 0) * 1.0 / g.n_class - g.g AS d
          FROM grid g LEFT JOIN cdist c
            ON c.nk = g.nk AND c.seg = g.seg AND c.b = g.b
        ),
        emd AS (
          SELECT nk, seg, MAX(n_class) AS n_class,
                 SUM(ABS(cum)) / (COUNT(*) - 1.0) AS t
          FROM (
            SELECT nk, seg, n_class, b,
                   SUM(d) OVER (PARTITION BY nk, seg ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
            FROM diff
          ) GROUP BY nk, seg
        )
        SELECT CAST(nk AS BIGINT) AS nationkey, seg AS segment,
               CAST(n_class AS BIGINT) AS n_class,
               ROUND(t, 6) AS emd_t,
               CAST(CASE WHEN t > 0.25 THEN 1 ELSE 0 END AS BIGINT)
                 AS violates
        FROM emd
        ORDER BY ROUND(t, 6) DESC, nationkey, segment
        LIMIT 12
    """,
    doc="t-closeness audit (Li/Li/Venkatasubramanian 2007), completing "
    "the anonymization triad next to k-anonymity (q257: classes big "
    "enough) and l-diversity (q294: classes varied enough): each "
    "(nation, segment) equivalence class's ORDERED sensitive-"
    "attribute distribution (account-balance buckets) must stay "
    "within EMD t of the global one — the property that kills the "
    "skewness attack l-diversity misses (a class can hold l distinct "
    "values yet be 95% 'negative-balance', leaking the attribute "
    "anyway). EMD over the ordered buckets is the normalized "
    "|cumulative-difference| sum, the same 1-D transport integral "
    "q303's Wasserstein drift uses. Worst 12 classes by rounded t "
    "with deterministic tiebreaks. Plan shape: two bounded censuses "
    "(global buckets, class x bucket grid), the cumulative window "
    "PARTITIONED BY class (per-key parallel), TakeOrdered(12).",
)
def q324(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from harmony_spark.io import table_parallel

    lab = table_parallel(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / _TC_BUCKET).cast("long").alias("b"),
    )
    n = lab.count()
    gdist = lab.groupBy("b").agg((F.count("*") * 1.0 / n).alias("g"))
    classes = lab.groupBy("nk", "seg").agg(F.count("*").alias("n_class"))
    grid = classes.crossJoin(F.broadcast(gdist))
    cdist = lab.groupBy("nk", "seg", "b").agg(F.count("*").alias("cnt"))
    diff = grid.join(cdist, ["nk", "seg", "b"], "left").select(
        "nk",
        "seg",
        "n_class",
        "b",
        (
            F.coalesce("cnt", F.lit(0)) * 1.0 / F.col("n_class") - F.col("g")
        ).alias("d"),
    )
    w = Window.partitionBy("nk", "seg").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    emd = (
        diff.withColumn("cum", F.sum("d").over(w))
        .groupBy("nk", "seg")
        .agg(
            F.max("n_class").alias("n_class"),
            (F.sum(F.abs("cum")) / (F.count("*") - 1.0)).alias("t"),
        )
    )
    return (
        emd.select(
            F.col("nk").cast("long").alias("nationkey"),
            F.col("seg").alias("segment"),
            F.col("n_class").cast("long").alias("n_class"),
            F.round("t", 6).alias("emd_t"),
            F.when(F.col("t") > 0.25, 1).otherwise(0).cast("long").alias(
                "violates"
            ),
        )
        .orderBy(F.desc("emd_t"), "nationkey", "segment")
        .limit(12)
    )
