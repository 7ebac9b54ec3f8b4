"""Entity resolution (record linkage): blocking + pairwise string
similarity + transitive clustering.

The classic three-stage match pipeline (Fellegi-Sunter shape, here
with deterministic edit-distance scoring): (1) BLOCK records by a
cheap key so candidate pairs are generated bucket-locally — never a
global cross join; (2) SCORE each in-block pair with an edit-distance
comparator on a normalized key field; (3) CLUSTER matching pairs with
connected components so A~B~C resolves into one entity even when A-C
never scored. The same discipline as the MinHash/SRP dedup family
(extensions/dedup.py): pair generation is the scale hazard, and the
block key bounds it. At 100 TB the block key must carry enough entropy
(compose multiple fields); a hot block is handled exactly like a hot
LSH band — re-key on extra features (operators/skew.py tools apply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.operators.graph import connected_components
from harmony_spark.registry import register

ER_HEAD_CHARS = 30  # normalized comparison key: first 30 chars
ER_MAX_EDITS = 10  # levenshtein threshold on the head


def resolve_entities(
    records: DataFrame,
    id_col: str,
    key_col: str,
    block_col: str,
    max_edits: int = ER_MAX_EDITS,
) -> DataFrame:
    """Cluster records whose ``key_col`` values are within
    ``max_edits`` levenshtein distance, considering only pairs that
    share ``block_col``. Returns DataFrame[node, component] over
    records that matched at least one other record (the CC contract:
    singletons are absent — same as q73).
    """
    keyed = records.select(
        F.col(id_col).alias("rid"),
        F.col(key_col).alias("k"),
        F.col(block_col).alias("blk"),
    ).localCheckpoint(eager=False)
    a, b = keyed.alias("a"), keyed.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .where(F.levenshtein(F.col("a.k"), F.col("b.k")) <= max_edits)
        .select(F.col("a.rid").alias("src"), F.col("b.rid").alias("dst"))
        .distinct()
    )
    return connected_components(edges)


@register(
    "q167_entity_resolution",
    oracle=f"""
        WITH RECURSIVE rec AS (
          SELECT doc_id,
                 substr(lower(text), 1, {ER_HEAD_CHARS}) AS k,
                 list_aggr(string_split_regex(lower(text), '\\s+')[1:2],
                           'string_agg', ' ') AS blk
          FROM documents
        ),
        e AS (
          SELECT a.doc_id AS da, b.doc_id AS db
          FROM rec a JOIN rec b
            ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE levenshtein(a.k, b.k) <= {ER_MAX_EDITS}
        ),
        bi AS (SELECT da AS a, db AS b FROM e
               UNION ALL SELECT db AS a, da AS b FROM e),
        reach(a, b) AS (
          SELECT a, b FROM bi
          UNION
          SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a),
        cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS entity_id
               FROM reach GROUP BY a)
        SELECT entity_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MAX(doc_id) AS BIGINT) AS max_member
        FROM cc GROUP BY entity_id ORDER BY entity_id
    """,
    doc="Entity resolution over documents: block on the first two "
    "tokens (cheap deterministic key), score in-block pairs with "
    "levenshtein on the normalized 30-char head, and resolve matches "
    "transitively with connected components (large/small-star, "
    "O(log n) rounds) — the record-linkage pipeline behind customer "
    "dedup and citation matching, sharing the bucket-local pair "
    "discipline of the MinHash family. Spark's iterative star CC and "
    "DuckDB's recursive-CTE transitive closure are independent "
    "algorithms agreeing on the entity partition. Scale note: the "
    "block key is the fan-out bound — compose more fields (or re-key "
    "hot blocks, operators/skew.py) when a block outgrows an "
    "executor.",
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    toks = F.split(F.lower("text"), r"\s+")
    rec = table_parallel(spark, sf, "documents").select(
        "doc_id",
        F.substring(F.lower("text"), 1, ER_HEAD_CHARS).alias("head"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("blk"),
    )
    cc = resolve_entities(
        rec, id_col="doc_id", key_col="head", block_col="blk"
    )
    return (
        cc.groupBy(F.col("component").alias("entity_id"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max("node").cast("long").alias("max_member"),
        )
        .orderBy("entity_id")
    )


@register(
    "q273_golden_record",
    oracle=rf"""
        WITH RECURSIVE rec AS (
          SELECT doc_id, lang, n_chars,
                 substr(lower(text), 1, {ER_HEAD_CHARS}) AS k,
                 list_aggr(string_split_regex(lower(text), '\s+')[1:2],
                           'string_agg', ' ') AS blk
          FROM documents
        ),
        e AS (
          SELECT a.doc_id AS da, b.doc_id AS db
          FROM rec a JOIN rec b
            ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE levenshtein(a.k, b.k) <= {ER_MAX_EDITS}
        ),
        bi AS (SELECT da AS a, db AS b FROM e
               UNION ALL SELECT db AS a, da AS b FROM e),
        reach(a, b) AS (
          SELECT a, b FROM bi
          UNION
          SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a),
        cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS entity_id
               FROM reach GROUP BY a),
        mem AS (
          SELECT cc.entity_id, d.doc_id, d.lang, d.n_chars
          FROM cc JOIN documents d ON d.doc_id = cc.doc_id
        ),
        keeper AS (
          SELECT entity_id, doc_id AS keeper_doc FROM (
            SELECT entity_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY entity_id
                                      ORDER BY n_chars DESC, doc_id) AS r
            FROM mem
          ) t WHERE r = 1
        ),
        langmode AS (
          SELECT entity_id, lang AS mode_lang FROM (
            SELECT entity_id, lang, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY entity_id
                                      ORDER BY COUNT(*) DESC, lang) AS r
            FROM mem GROUP BY entity_id, lang
          ) t WHERE r = 1
        )
        SELECT m.entity_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(MAX(k.keeper_doc) AS BIGINT) AS keeper_doc,
               MAX(lm.mode_lang) AS mode_lang,
               CAST(SUM(m.n_chars) AS BIGINT) AS total_chars
        FROM mem m
        JOIN keeper k ON k.entity_id = m.entity_id
        JOIN langmode lm ON lm.entity_id = m.entity_id
        GROUP BY m.entity_id ORDER BY m.entity_id
    """,
    doc="Survivorship / golden-record construction — the step AFTER "
    "entity resolution (q167) that master-data management actually "
    "ships: per resolved entity, the canonical record by the "
    "longest-record-wins rule (max n_chars, doc-id tiebreak), the "
    "mode language (most frequent value, deterministic min-value "
    "tiebreak — the per-field survivorship vote), and the merged "
    "total size. Field-level survivorship is what distinguishes MDM "
    "merge from plain dedup keep-one (q224 keeps a row; this FUSES "
    "rows field-by-field). Scale shape: reuses resolve_entities "
    "(bucket-local pair generation + O(log n) star CC); everything "
    "after is (entity)-keyed aggregates and two argmax windows over "
    "cluster-sized groups. The oracle replays the identical closure "
    "recursively plus the same deterministic votes.",
)
def q273(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from harmony_spark.io import table_parallel

    toks = F.split(F.lower("text"), r"\s+")
    docs = table_parallel(spark, sf, "documents")
    rec = docs.select(
        "doc_id",
        F.substring(F.lower("text"), 1, ER_HEAD_CHARS).alias("head"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("blk"),
    )
    cc = resolve_entities(rec, id_col="doc_id", key_col="head", block_col="blk")
    mem = cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("entity_id")
    ).join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    keeper = (
        mem.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(
                    F.desc("n_chars"), "doc_id"
                )
            ),
        )
        .where(F.col("r") == 1)
        .select("entity_id", F.col("doc_id").alias("keeper_doc"))
    )
    langmode = (
        mem.groupBy("entity_id", "lang")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(F.desc("c"), "lang")
            ),
        )
        .where(F.col("r") == 1)
        .select("entity_id", F.col("lang").alias("mode_lang"))
    )
    return (
        mem.groupBy("entity_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .join(keeper, "entity_id")
        .join(langmode, "entity_id")
        .select(
            "entity_id",
            "n_members",
            F.col("keeper_doc").cast("long").alias("keeper_doc"),
            "mode_lang",
            "total_chars",
        )
        .orderBy("entity_id")
    )
