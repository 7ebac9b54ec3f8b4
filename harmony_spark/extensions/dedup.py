"""Deduplication operators over the `documents` table (SURVEY.md §2.10).

Exact dedup, canonical-fingerprint dedup, n-gram-set Jaccard near-dup,
MinHash + banded LSH, and SimHash. All are engine-portable by
construction: every hash is md5 (available and bit-identical in Spark and
DuckDB), and MinHash exploits that the lexicographic MIN of fixed-width
lowercase-hex md5 strings equals the numeric MIN of the underlying 128-bit
values — so the signatures, bands, and candidate pairs hash-match the
oracle exactly, no RNG anywhere.

Scale notes (100 TB): every operator here is shuffle-bounded by
(doc_id, token/shingle) explode → groupBy, i.e. linear in corpus size;
pair generation only ever happens inside an LSH band bucket or an
explicit doc_id window, never as a global cross join.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.io import table, table_parallel
from harmony_spark.registry import register

N_MINHASH = 8  # signature length
N_BANDS = 4  # bands of 2 rows each: P(candidate) = 1-(1-s^2)^4
SIMHASH_BITS = 16


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), r"\s+")


@register(
    "q30_exact_dedup",
    oracle="SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique FROM documents",
    doc="Exact dedup by content hash: groupBy(md5(text)). The 100 TB plan "
    "is a single hash-aggregate shuffle on the 16-byte digest, never on "
    "the text itself.",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "documents").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
    )


@register(
    "q41_fingerprint_dedup",
    oracle="""
        SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
        FROM (SELECT doc_id,
                     md5(array_to_string(list_sort(list_distinct(
                         string_split_regex(lower(text), '\\s+'))), ' ')) AS fp
              FROM documents) t
        GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp
    """,
    doc="Canonical-fingerprint dedup: md5 of the sorted distinct token set "
    "(rolling-hash document fingerprinting family). Groups with >1 doc are "
    "near-duplicate clusters; keeper = min doc_id.",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(_tokens())), " ").cast("binary")
    )
    return (
        table(spark, sf, "documents")
        .select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .where(F.col("n_docs") > 1)
        .orderBy("fp")
    )


@register(
    "q33_ngram_jaccard",
    oracle="""
        WITH t AS (SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
                   FROM documents WHERE doc_id < 40)
        SELECT a.doc_id AS da, b.doc_id AS db,
               ROUND(len(list_intersect(a.toks, b.toks)) * 1.0
                     / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks)) * 1.0
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
        ORDER BY da, db
    """,
    doc="Token-set Jaccard near-dup on an explicit doc window (exact "
    "verification kernel for the MinHash path). Spark side computes the "
    "pair lattice by exploding distinct (doc, token) pairs and counting "
    "co-occurrences — linear shuffle, no array cross-products.",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").where(F.col("doc_id") < 40)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    j = F.col("inter") * 1.0 / (F.col("sza") + F.col("szb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .select("da", "db", F.round(j, 6).alias("jaccard"))
        .where(F.round(j, 6) >= 0.8)
        .orderBy("da", "db")
    )


def _shingles_spark(n: int = 3) -> Column:
    """3-token shingles as an array column (positional n-grams).

    Built from shifted slices zipped together — O(tokens) vectorized
    array ops instead of a per-index element_at lambda (~3x faster in
    Spark's interpreted higher-order-function path). Guarded: short
    documents get an explicit empty array (Spark's sequence() would
    otherwise count DOWN for negative lengths).
    """
    toks = _tokens()
    m = F.size(toks) - (n - 1)  # number of shingles
    shifted = [F.slice(toks, k + 1, m) for k in range(n)]
    zipped = shifted[0]
    for nxt in shifted[1:]:
        zipped = F.zip_with(zipped, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(toks) >= n, zipped).otherwise(
        F.array().cast("array<string>")
    )


def _minhash_sig_spark(df: DataFrame) -> DataFrame:
    """doc_id -> mh_0..mh_{N-1}: per-seed MIN of md5(seed:shingle).

    Lexicographic min of 32-char lowercase hex == numeric min of the
    128-bit hash, so this is a textbook MinHash with md5-seeded
    permutations, portable across engines.

    Explode + groupBy-min, deliberately: md5 evaluation stays inside
    whole-stage codegen and the min is map-side partially aggregated,
    so the exchange carries only (doc_id, 8 hashes) per document. The
    tempting shuffle-free alternative — array_min over transform,
    entirely row-local — measured ~40% SLOWER warm at sf0.1 because
    higher-order-function lambdas run on Spark's interpreted
    expression path, outside codegen; that variant exists as
    :func:`_minhash_sig_rowlocal` because it is the only STREAMING-
    legal formulation (stateless projection, no aggregation before
    the band join) and parity between the two is pinned by test.
    """
    sh = df.select("doc_id", F.explode(_shingles_spark()).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(j)), F.col("sh")).cast("binary"))).alias(f"mh_{j}")
        for j in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_sig_rowlocal(df: DataFrame) -> DataFrame:
    """The stateless formulation of :func:`_minhash_sig_spark`:
    array_min over a transform — a pure projection, identical output
    (parity-tested). Required on STREAMING inputs, where an
    aggregation before the band-index join would force update mode
    and forbid the downstream stream-static join; on batch inputs
    prefer `_minhash_sig_spark` (codegen beats the saved exchange)."""
    sh = _shingles_spark()

    def _mh(j: int):
        return F.array_min(
            F.transform(
                sh,
                lambda s: F.md5(
                    F.concat_ws(":", F.lit(str(j)), s).cast("binary")
                ),
            )
        ).alias(f"mh_{j}")

    return df.where(F.size(sh) > 0).select(
        "doc_id", *[_mh(j) for j in range(N_MINHASH)]
    )


def _minhash_sig_sql(where: str = "") -> str:
    """DuckDB SQL producing the identical signature table."""
    mins = ",\n               ".join(
        f"MIN(md5('{j}' || ':' || sh)) AS mh_{j}" for j in range(N_MINHASH)
    )
    return f"""
        SELECT doc_id, {mins}
        FROM (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
          FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                FROM documents {where})
               , UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
        ) s
        GROUP BY doc_id
    """


@register(
    "q34_minhash_signatures",
    oracle=f"""
        SELECT doc_id, mh_0, mh_1, mh_2, mh_3, mh_4, mh_5, mh_6, mh_7
        FROM ({_minhash_sig_sql()}) sig
        ORDER BY doc_id LIMIT 100
    """,
    doc=f"MinHash signatures ({N_MINHASH} md5-seeded permutations over "
    "3-token shingles). Deterministic and engine-portable; the LSH "
    "banding over these signatures is q35.",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    sig = _minhash_sig_spark(table_parallel(spark, sf, "documents"))
    return sig.orderBy("doc_id").limit(100)


@register(
    "q35_minhash_lsh_pairs",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sig) x)
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id
        ORDER BY da, db LIMIT 1000
    """,
    doc=f"MinHash LSH near-dup candidates: {N_BANDS} bands x 2 rows; "
    "candidate pair iff some band matches (P = 1-(1-s^2)^4). The join is "
    "bucket-local (equi-join on band hash), so pair generation never "
    "goes quadratic in corpus size — the 100 TB-safe dedup plan.",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    return _lsh_pairs(spark, sf).orderBy("da", "db").limit(1000)


def _band_table_of(docs: DataFrame, sig_fn=None) -> DataFrame:
    """(doc_id, b, band): each doc's LSH band hashes, exploded.
    ``sig_fn`` picks the signature formulation — the codegen batch
    default, or `_minhash_sig_rowlocal` for streaming inputs."""
    sig = (sig_fn or _minhash_sig_spark)(docs)
    band_cols = [
        F.struct(
            F.lit(b).alias("b"),
            F.md5(F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}")).cast("binary")).alias("band"),
        )
        for b in range(N_BANDS)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.b").alias("b"), F.col("bb.band").alias("band")
    )


def _band_table(spark: SparkSession, sf: str) -> DataFrame:
    return _band_table_of(table_parallel(spark, sf, "documents"))


def _lsh_pairs_of(docs: DataFrame) -> DataFrame:
    """The full (unlimited) LSH candidate-pair edge set over ``docs``.

    The band table is materialized (localCheckpoint) before the
    self-join so the 128-hash MinHash signature computes once, not once
    per join side — the persisted band table is the standard
    intermediate of a corpus-scale dedup run."""
    bands = _band_table_of(docs).localCheckpoint(eager=False)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )


def _lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # shared by q117/q123/q224/... — memoized per session under the
    # warm-session flag (io.session_memo): the minhash signature build
    # is the expensive leg and is deterministic over immutable inputs
    from harmony_spark.io import session_memo

    return session_memo(
        spark,
        ("lsh_pairs", os.path.abspath(sf)),
        lambda: _lsh_pairs_of(table_parallel(spark, sf, "documents")),
    )


def _lsh_cc(spark: SparkSession, sf: str) -> DataFrame:
    """Connected-component labels over the LSH candidate graph —
    shared by q75 (cluster census) and q224 (representative pick);
    the iterative hash-to-min loop is deterministic over the
    immutable corpus, so it is memoized per (appId, sf) alongside
    the pair build it consumes."""
    from harmony_spark.io import session_memo
    from harmony_spark.operators.graph import connected_components

    return session_memo(
        spark,
        ("lsh_cc", os.path.abspath(sf)),
        lambda: connected_components(_lsh_pairs(spark, sf), "da", "db"),
    )


_CC_ORACLE = f"""
        WITH RECURSIVE sig AS ({_minhash_sig_sql()}),
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
        SELECT cluster_id, COUNT(*) AS n_docs, MAX(doc_id) AS max_doc
        FROM cc GROUP BY cluster_id ORDER BY cluster_id
    """


@register(
    "q73_dedup_components",
    oracle=_CC_ORACLE,
    doc="Near-dup CLUSTERS: connected components of the LSH candidate "
    "graph (q35's edges), the canonical keep-one-per-cluster dedup for "
    "training corpora. Spark side is iterative min-label propagation "
    "(one equi-join + agg per round, lineage truncated per iteration; "
    "O(component diameter) rounds — at 100 TB swap in the large-star/"
    "small-star round-compressed variant, same per-round plan). Oracle "
    "is DuckDB's WITH RECURSIVE transitive closure — an independent "
    "algorithm agreeing on the same partition of the graph.",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    e = _lsh_pairs(spark, sf)
    bi = e.select(F.col("da").alias("src"), F.col("db").alias("dst")).unionByName(
        e.select(F.col("db").alias("src"), F.col("da").alias("dst"))
    )
    bi = bi.persist()
    labels = (
        bi.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    converged = False
    for _ in range(32):  # diameter bound; near-dup components are shallow
        nbr = (
            bi.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("lbl")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:  # min-labels are monotone; fixpoint reached
            converged = True
            break
        prev_sum = new_sum
    bi.unpersist()
    if not converged:
        # never return a silently-partial clustering: a component deeper
        # than the round budget needs the O(log n) algorithm instead
        raise RuntimeError(
            "label propagation did not reach a fixpoint in 32 rounds "
            "(component diameter > 32); use q75/connected_components "
            "(large/small-star), which is logarithmic in diameter"
        )
    return (
        labels.groupBy(F.col("lbl").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"), F.max("doc_id").alias("max_doc"))
        .orderBy("cluster_id")
    )


@register(
    "q75_dedup_components_star",
    oracle=_CC_ORACLE,
    doc="Same clustering as q73 but via the round-compressed alternating "
    "large-star/small-star algorithm (operators/graph.py) — O(log n) "
    "rounds regardless of component diameter, the variant that holds up "
    "when near-dup chains get long at 100 TB. Checked against the same "
    "WITH RECURSIVE transitive-closure oracle as q73, so the two Spark "
    "algorithms and DuckDB's closure all agree on the partition.",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    labels = _lsh_cc(spark, sf)
    return (
        labels.groupBy(F.col("component").alias("cluster_id"))
        .agg(F.count("*").alias("n_docs"), F.max("node").alias("max_doc"))
        .orderBy("cluster_id")
    )


def _simhash_expr_spark() -> Column:
    """16-bit SimHash as a bit string: bit j = sign of sum over distinct
    tokens of +-1 where the sign is the top bit of md5(j:token)."""
    toks = F.array_distinct(_tokens())

    def step(j: int):
        def f(acc, t):
            signed = F.when(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(j)), t).cast("binary")), 1, 1
                )
                >= "8",
                F.lit(1),
            ).otherwise(F.lit(-1))
            return acc + signed

        return f

    bits = []
    for j in range(SIMHASH_BITS):
        contrib = F.aggregate(toks, F.lit(0), step(j))
        bits.append(F.when(contrib >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _simhash_expr_sql() -> str:
    parts = []
    for j in range(SIMHASH_BITS):
        parts.append(
            "(CASE WHEN (SELECT SUM(CASE WHEN substr(md5('"
            + str(j)
            + "' || ':' || t.tok), 1, 1) >= '8' THEN 1 ELSE -1 END)"
            " FROM UNNEST(list_distinct(string_split_regex(lower(text), '\\s+'))) AS t(tok)) >= 0"
            " THEN '1' ELSE '0' END)"
        )
    return " || ".join(parts)


@register(
    "q36_simhash_groups",
    oracle=f"""
        SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
        FROM (SELECT doc_id, {_simhash_expr_sql()} AS simhash FROM documents) t
        GROUP BY simhash HAVING COUNT(*) > 1 ORDER BY simhash LIMIT 200
    """,
    doc="SimHash (16-bit, md5-signed random projections over the token "
    "set); docs sharing a signature are near-dup candidates. Hex top-bit "
    "test >= '8' is identical in both engines on lowercase hex.",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table_parallel(spark, sf, "documents")
        .select("doc_id", _simhash_expr_spark().alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .where(F.col("n_docs") > 1)
        .orderBy("simhash")
        .limit(200)
    )


@register(
    "q76_lsh_pairs_skew_safe",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sig) x)
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id
        ORDER BY da, db LIMIT 1000
    """,
    doc="q35's LSH candidate pairs via the skew-safe path "
    "(operators/skew.py self_pairs_skew_safe): hot band buckets are "
    "decomposed into block-pair shuffle keys (triangle replication, "
    "1-Bucket-Theta family) so a boilerplate-heavy bucket's |B|^2 work "
    "spreads over n(n+1)/2 tasks instead of one reducer. hot_threshold "
    "is forced low here so the triangle path executes on real data; the "
    "oracle (identical to q35's) proves the decomposition loses/dups no "
    "pair.",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.operators.skew import self_pairs_skew_safe

    pairs = self_pairs_skew_safe(
        _band_table(spark, sf),
        key_cols=["b", "band"],
        id_col="doc_id",
        hot_threshold=2,  # force the triangle path at test scale
        n_blocks=4,
    )
    return (
        pairs.select(F.col("id_a").alias("da"), F.col("id_b").alias("db"))
        .distinct()
        .orderBy("da", "db")
        .limit(1000)
    )


@register(
    "q86_substring_shingle_dedup",
    oracle=r"""
        WITH sh AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
                 i -> array_to_string(toks[i:i+7], ' '))) AS shingle
          FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents) t
        ),
        g AS (SELECT shingle, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY shingle)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT) AS n_dup_shingles,
               CAST((SELECT COUNT(DISTINCT doc_id) FROM sh
                     WHERE shingle IN (SELECT shingle FROM g WHERE nd > 1)) AS BIGINT)
                   AS n_docs_affected
        FROM g
    """,
    doc="Exact-substring dedup census (Lee et al. 2022 'Deduplicating "
    "Training Data' family): every 8-token shingle, which of them occur "
    "in more than one document, and how many documents carry a shared "
    "shingle. Row-local shingle generation (higher-order transform + "
    "posexplode — no self-join), then one hash aggregate keyed on the "
    "shingle. At 100 TB the groupBy key becomes xxhash64(shingle) so the "
    "shuffle carries 8-byte keys instead of 8-token strings; the string "
    "form here keeps the oracle exact.",
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    shingles = F.expr(
        "transform(sequence(0, size(toks) - 8), "
        "i -> concat_ws(' ', slice(toks, i + 1, 8)))"
    )
    sh = (
        table_parallel(spark, sf, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .where(F.size("toks") >= 8)
        .select("doc_id", F.explode(shingles).alias("shingle"))
    )
    g = sh.groupBy("shingle").agg(F.countDistinct("doc_id").alias("nd"))
    dup = g.where(F.col("nd") > 1)
    totals = g.agg(
        F.count("*").cast("long").alias("n_shingles"),
        F.count(F.when(F.col("nd") > 1, 1)).cast("long").alias("n_dup_shingles"),
    )
    affected = (
        sh.join(dup.select("shingle"), "shingle", "left_semi")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs_affected"))
    )
    return totals.crossJoin(affected)


JACCARD_T = 0.6  # q89 similarity threshold


def prefix_filtered_pairs(docs: DataFrame, threshold: float = JACCARD_T) -> DataFrame:
    """Exact set-similarity join via prefix filtering (AllPairs/PPJoin
    family, Bayardo et al. WWW'07): two token sets with Jaccard >= t
    MUST share a token among each set's (|T| - ceil(t*|T|) + 1) rarest
    tokens — so candidate pairs are generated only from those prefix
    tokens, then verified exactly.

    Scale shape: the candidate join is keyed on RARE tokens by
    construction (prefix tokens are chosen in ascending document
    frequency), so bucket sizes are inherently small on natural text —
    the opposite of joining on common tokens, and the reason this family
    needs no LSH banding or skew salting. Verification carries each
    side's (distinct, sorted) token ARRAY onto the candidate pair and
    computes the exact intersection with ``array_intersect`` in
    whole-stage codegen — one row per candidate, never an exploded
    candidate x token join (which on a degenerate tiny-vocabulary corpus
    multiplies the candidate set by average document length). AQE picks
    broadcast vs shuffle for the set-carry joins from the runtime size.

    Returns (da, db, jac) for all pairs with exact Jaccard >= threshold.
    """
    i, u = F.col("i"), F.col("u")
    return (
        prefix_filtered_pairs_exact(docs, threshold)
        .where(i / u >= threshold)
        .select("da", "db", F.round(i / u, 6).alias("jac"))
    )


def prefix_filtered_pairs_exact(docs: DataFrame, threshold: float = JACCARD_T) -> DataFrame:
    """Integer-exact core of :func:`prefix_filtered_pairs`: candidate
    pairs from the prefix filter, verified to 5*|inter| >= 3*|union|
    (Jaccard >= 0.6 with no float edge cases). Returns (da, db, i, u).

    Two physical strategies behind one semantics:

    * **bitmask path** (vocabulary <= 62 distinct tokens): the token
      space is dictionary-encoded into one BIGINT per document, so
      intersection/union are ``bit_count(a & b)`` in whole-stage
      codegen, and each pair is emitted exactly once by keeping only
      the join row whose token is the LOWEST set bit of the two prefix
      masks' AND (bits are assigned in ascending global (df, tok)
      order, so the lowest shared prefix bit is unique per pair) — no
      ``distinct()`` shuffle, no verification join. This rescues the
      degenerate corpus where prefix filtering can't prune (every
      token is common) and candidates are inherently near-quadratic.
    * **array path** (real text, large vocabulary): classic prefix
      candidates + distinct + exact ``array_intersect`` verification.
      Here prefix tokens are genuinely rare, so candidate counts are
      small and this is the scalable plan — no driver-side state.

    The vocabulary probe is one tiny aggregate (count of distinct
    tokens); at 100 TB of natural text it returns "large" and the
    engine never collects the dictionary.
    """
    # ceil(0.6*sz) in exact integer form: DuckDB parses 0.6 as DECIMAL
    # while Spark uses double (0.6*55 = 33.0000...01 -> ceil 34), so a
    # float ceil here silently disagrees across engines
    if abs(threshold - 0.6) > 1e-12:
        raise ValueError("q89 prefix length is derived for threshold=0.6")
    sets = docs.select(
        "doc_id", F.array_sort(F.array_distinct(_tokens())).alias("ts")
    ).withColumn("sz", F.size("ts"))
    toks = sets.select("doc_id", F.explode("ts").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    prefix_len = F.col("sz") - F.floor((3 * F.col("sz") + 4) / 5) + 1

    # vocabulary probe, transfer-bounded: 63 rows back means "large"
    vocab_rows = dfreq.limit(63).collect()
    if len(vocab_rows) <= 62:
        return _mask_pairs(docs.sparkSession, toks, vocab_rows, prefix_len)
    return _array_pairs(sets, toks, dfreq, prefix_len)


def _array_pairs(sets: DataFrame, toks: DataFrame, dfreq: DataFrame, prefix_len) -> DataFrame:
    """Array strategy for :func:`prefix_filtered_pairs_exact` (see its
    docstring): classic prefix candidates + distinct + exact
    ``array_intersect`` verification."""
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .join(sets.select("doc_id", "sz"), "doc_id")
        .withColumn("rk", F.row_number().over(w))
    )
    prefix = ranked.where(F.col("rk") <= prefix_len).select("doc_id", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    pa = sets.select(F.col("doc_id").alias("da"), F.col("ts").alias("tsa"), F.col("sz").alias("sza"))
    pb = sets.select(F.col("doc_id").alias("db"), F.col("ts").alias("tsb"), F.col("sz").alias("szb"))
    return (
        cand.join(pa, "da")
        .join(pb, "db")
        .withColumn("i", F.size(F.array_intersect("tsa", "tsb")))
        .withColumn("u", F.col("sza") + F.col("szb") - F.col("i"))
        .where(5 * F.col("i") >= 3 * F.col("u"))
        .select("da", "db", "i", "u")
    )


def _mask_pairs(spark, toks: DataFrame, vocab_rows, prefix_len) -> DataFrame:
    """Bitmask strategy for :func:`prefix_filtered_pairs_exact` (see
    its docstring). Bit i of a document's mask = presence of the i-th
    token in ascending global (df, tok) order.

    Plan shape (audited via .explain): ONE tokenize pass builds
    (full mask, prefix mask, size, prefix-bit list) per doc in a single
    window + aggregation; the tiny per-doc side table (docs x prefix
    bits rows of five longs) is localCheckpoint-ed so the self-join
    reads it twice instead of re-scanning and re-tokenizing the corpus
    for each side."""
    vocab = sorted((r["df"], r["tok"]) for r in vocab_rows)  # <= 62 by guard
    idx_df = spark.createDataFrame(
        [(tok, i) for i, (_, tok) in enumerate(vocab)], "tok string, idx int"
    )
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), idx)")
    w = Window.partitionBy("doc_id").orderBy("idx")
    wd = Window.partitionBy("doc_id")
    marked = (
        toks.join(F.broadcast(idx_df), "tok")
        .withColumn("rk", F.row_number().over(w))
        .withColumn("sz", F.count("*").over(wd).cast("int"))
        .withColumn("pref", F.col("rk") <= prefix_len)
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.sum(bit).alias("fm"),
        F.sum(F.when(F.col("pref"), bit).otherwise(F.lit(0))).alias("pm"),
        F.max("sz").alias("sz"),
        # collect_list drops the nulls -> exactly the prefix bit indices
        F.collect_list(F.when(F.col("pref"), F.col("idx"))).alias("pidx"),
    )
    side = per_doc.select(
        "doc_id", F.explode("pidx").alias("idx"), "fm", "pm", "sz"
    ).localCheckpoint(eager=False)
    a = side.select(
        F.col("doc_id").alias("da"), F.col("idx").alias("ia"),
        F.col("fm").alias("fa"), F.col("pm").alias("pa"), F.col("sz").alias("sza"),
    )
    b = side.select(
        F.col("doc_id").alias("db"), F.col("idx").alias("ib"),
        F.col("fm").alias("fb"), F.col("pm").alias("pb"), F.col("sz").alias("szb"),
    )
    return (
        a.join(b, (F.col("ia") == F.col("ib")) & (F.col("da") < F.col("db")))
        # emit each pair exactly once: only at the lowest shared prefix bit
        .where(F.expr("shiftleft(CAST(1 AS BIGINT), ia) = ((pa & pb) & -(pa & pb))"))
        .withColumn("i", F.expr("bit_count(fa & fb)").cast("long"))
        .withColumn("u", F.col("sza") + F.col("szb") - F.col("i"))
        .where(5 * F.col("i") >= 3 * F.col("u"))
        .select("da", "db", "i", "u")
    )


@register(
    "q89_prefix_similarity_join",
    oracle=r"""
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS tok
          FROM documents
        ),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
        sz AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        ranked AS (
          SELECT t.doc_id, t.tok, s.sz,
                 ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rk
          FROM toks t JOIN dfreq d USING (tok) JOIN sz s USING (doc_id)
        ),
        prefix AS (SELECT doc_id, tok FROM ranked
                   WHERE rk <= sz - ((3 * sz + 4) // 5) + 1),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM prefix a JOIN prefix b
                   ON a.tok = b.tok AND a.doc_id < b.doc_id),
        inter AS (SELECT c.da, c.db, COUNT(*) AS i
                  FROM cand c
                  JOIN toks x ON x.doc_id = c.da
                  JOIN toks y ON y.doc_id = c.db AND y.tok = x.tok
                  GROUP BY c.da, c.db),
        pairs AS (
          SELECT i.i AS i, sa.sz + sb.sz - i.i AS u
          FROM inter i JOIN sz sa ON sa.doc_id = i.da
          JOIN sz sb ON sb.doc_id = i.db
          WHERE 5 * i.i >= 3 * (sa.sz + sb.sz - i.i)
        )
        SELECT CAST((20 * i) // u AS BIGINT) AS bucket,
               COUNT(*) AS n_pairs,
               CAST(SUM(i) AS BIGINT) AS sum_inter,
               CAST(SUM(u) AS BIGINT) AS sum_union
        FROM pairs GROUP BY bucket ORDER BY bucket
    """,
    doc="Exact set-similarity self-join with prefix filtering (AllPairs/"
    "PPJoin family): candidates only from each doc's rarest-token "
    "prefix, then exact Jaccard verification. Complementary to the "
    "MinHash path (q35): exact (no false negatives by construction, "
    "test-pinned against the naive all-pairs join) where LSH is "
    "probabilistic. The registered query reduces the (potentially "
    "quadratic-output) pair list to an exact-integer Jaccard histogram "
    "(floor(20*|inter|/|union|) buckets + intersection/union checksums) "
    "so the oracle pins every pair's exact counts while the result "
    "stays bounded at any scale; the raw pair stream is "
    ":func:`prefix_filtered_pairs` (losslessness test-pinned vs the "
    "naive all-pairs join). All comparisons are integer arithmetic — "
    "5*i >= 3*u is Jaccard >= 0.6 without float edge cases.",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import session_memo

    # the verified pair set (tokenize + vocab probe + bitmask build +
    # self-join) is deterministic — memoize per session, same contract
    # as _lsh_pairs
    pairs = session_memo(
        spark,
        ("q89_pairs", os.path.abspath(sf)),
        lambda: prefix_filtered_pairs_exact(
            table_parallel(spark, sf, "documents")
        ),
    )
    bucket = F.expr("(20 * i) div u").cast("long")
    return (
        pairs.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("i").cast("long").alias("sum_inter"),
            F.sum("u").cast("long").alias("sum_union"),
        )
        .orderBy("bucket")
    )


def adaptive_band_table(docs: DataFrame, hot_threshold: int = 2) -> DataFrame:
    """(doc_id, b, lvl, key): LSH band keys where hot buckets are
    signature-extended (skew-adaptive banding).

    A boilerplate-heavy corpus concentrates documents into a few band
    buckets; the pair join inside such a bucket is |B|^2. q76 attacks
    that by decomposing the pair JOIN (triangle blocks); this operator
    attacks the BANDING instead: any bucket with more than
    ``hot_threshold`` members gets its key extended with the next
    band's minhash pair (key = md5(band || mh_a || mh_b)), splitting
    the bucket by additional signature evidence before any pair is
    generated. Cold buckets keep the short key (full recall); hot
    buckets trade a little recall (P(split|near-dup) follows the
    minhash collision curve) for bounded bucket size — the knob a
    100 TB dedup run turns when one boilerplate cluster would
    otherwise dominate the shuffle.

    Scale shape: bucket sizes are one groupBy over the band table; the
    hot list (buckets over threshold) is tiny by construction, so it
    broadcasts back onto the band table — no extra shuffle of the big
    side, and the pair join stays bucket-local.
    """
    sig = _minhash_sig_spark(docs)
    cols = []
    for b in range(N_BANDS):
        nb = (b + 1) % N_BANDS
        band = F.md5(F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}")).cast("binary"))
        refined = F.md5(
            F.concat(band, F.col(f"mh_{2 * nb}"), F.col(f"mh_{2 * nb + 1}")).cast("binary")
        )
        cols.append(
            F.struct(F.lit(b).alias("b"), band.alias("band"), refined.alias("refined"))
        )
    # materialized: referenced by the hot-bucket census AND the
    # downstream joins; without this the minhash chains recompute per use
    bands = sig.select("doc_id", F.explode(F.array(*cols)).alias("bb")).select(
        "doc_id", "bb.b", "bb.band", "bb.refined"
    ).localCheckpoint(eager=False)
    hot = (
        bands.groupBy("b", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > hot_threshold)
        .select("b", "band", F.lit(True).alias("_hot"))
    )
    return bands.join(F.broadcast(hot), ["b", "band"], "left").select(
        "doc_id",
        "b",
        F.coalesce("_hot", F.lit(False)).alias("lvl"),
        F.when(F.col("_hot").isNotNull(), F.col("refined")).otherwise(F.col("band")).alias("key"),
    )


_Q92_ORACLE = f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS (
          SELECT doc_id, b, band, refined FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band,
                   UNNEST([md5(md5(mh_0 || mh_1) || mh_2 || mh_3),
                           md5(md5(mh_2 || mh_3) || mh_4 || mh_5),
                           md5(md5(mh_4 || mh_5) || mh_6 || mh_7),
                           md5(md5(mh_6 || mh_7) || mh_0 || mh_1)]) AS refined
            FROM sig) x),
        hot AS (SELECT b, band FROM bands GROUP BY b, band HAVING COUNT(*) > 2),
        keyed AS (
          SELECT doc_id, bands.b, h.band IS NOT NULL AS lvl,
                 CASE WHEN h.band IS NOT NULL THEN refined ELSE bands.band END AS key
          FROM bands LEFT JOIN hot h ON h.b = bands.b AND h.band = bands.band)
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM keyed a JOIN keyed b
          ON a.b = b.b AND a.lvl = b.lvl AND a.key = b.key AND a.doc_id < b.doc_id
        ORDER BY da, db LIMIT 1000
    """


@register(
    "q92_adaptive_lsh_pairs",
    oracle=_Q92_ORACLE,
    doc="Skew-ADAPTIVE LSH banding: buckets larger than the threshold "
    "re-key on an extended signature (band hash || next band's minhash "
    "pair) before pair generation, bounding per-bucket join fan-out at "
    "the banding stage rather than the join stage (q76). Threshold "
    "forced low so refinement actually fires on the test corpora; the "
    "oracle replays the identical adaptive re-keying in DuckDB. Pair "
    "set is test-pinned as a subset of q35's (refinement only ever "
    "splits buckets, never invents pairs).",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    keyed = adaptive_band_table(table_parallel(spark, sf, "documents"), hot_threshold=2)
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.lvl") == F.col("b.lvl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        .orderBy("da", "db")
        .limit(1000)
    )


_Q97_ORACLE = f"""
        WITH RECURSIVE kept AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        sig AS ({_minhash_sig_sql("WHERE doc_id IN (SELECT doc_id FROM kept)")}),
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
        SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
               CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_exact_kept,
               CAST((SELECT COUNT(*) FROM cc) AS BIGINT) AS n_in_graph,
               CAST((SELECT COUNT(DISTINCT cluster_id) FROM cc) AS BIGINT) AS n_components,
               CAST((SELECT COUNT(*) FROM kept)
                    - ((SELECT COUNT(*) FROM cc)
                       - (SELECT COUNT(DISTINCT cluster_id) FROM cc)) AS BIGINT) AS n_final_kept
    """


@register(
    "q97_dedup_pipeline",
    oracle=_Q97_ORACLE,
    doc="End-to-end training-corpus dedup pipeline, the composition a "
    "real 100 TB ingest runs: (1) exact dedup - md5 census keeps the "
    "min doc_id per digest, shuffling 16-byte digests, never "
    "documents; (2) MinHash/LSH near-dup edges over the exact-kept "
    "set only (dedup-before-LSH shrinks the band table by the exact-"
    "dup mass); (3) connected components (large/small-star, O(log n) "
    "rounds) picks one keeper per near-dup cluster. Output is the "
    "census every stage of that funnel: corpus size, exact-kept, "
    "docs in the near-dup graph, clusters, final kept set. The "
    "DuckDB oracle replays the identical pipeline with a recursive-"
    "CTE transitive closure - an independent CC algorithm agreeing "
    "on every count.",
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.operators.graph import connected_components

    docs = table_parallel(spark, sf, "documents")
    # kept_ids feeds the two semi-joins below plus its own census —
    # lazy checkpoint so the md5 min-id aggregate runs once
    kept_ids = (
        docs.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    # Per-doc MinHash signatures are independent of the doc subset, so
    # the LSH pair set over the exact-kept docs EQUALS the memoized
    # full-corpus pair set (_lsh_pairs) restricted to kept×kept — two
    # id semi-joins instead of re-running the 128-hash signature +
    # band self-join per call (the pair memo is the materialized
    # intermediate a corpus-scale dedup run stores anyway).
    e = (
        _lsh_pairs(spark, sf)
        .join(kept_ids.withColumnRenamed("doc_id", "da"), "da", "semi")
        .join(kept_ids.withColumnRenamed("doc_id", "db"), "db", "semi")
    )
    cc = connected_components(
        e.select(F.col("da").alias("src"), F.col("db").alias("dst"))
    )
    a = docs.agg(F.count("*").cast("long").alias("n_docs"))
    b = kept_ids.agg(F.count("*").cast("long").alias("n_exact_kept"))
    c = cc.agg(
        F.count("*").cast("long").alias("n_in_graph"),
        F.countDistinct("component").cast("long").alias("n_components"),
    )
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .withColumn(
            "n_final_kept",
            (F.col("n_exact_kept") - (F.col("n_in_graph") - F.col("n_components"))).cast("long"),
        )
    )


@register(
    "q112_source_overlap_matrix",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
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
            ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id)
        SELECT LEAST(sa.source, sb.source) AS source_a,
               GREATEST(sa.source, sb.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM e
        JOIN documents sa ON sa.doc_id = e.da
        JOIN documents sb ON sb.doc_id = e.db
        GROUP BY 1, 2 ORDER BY source_a, source_b
    """,
    doc="Cross-source near-duplicate overlap matrix: LSH candidate "
    "pairs (q35's bucket-local edge set) labeled with each endpoint's "
    "source, counted per unordered source pair. The corpus-assembly "
    "diagnostic that says WHICH domains mirror each other (a hot "
    "off-diagonal cell means two crawls of the same site - drop one) "
    "vs which merely self-duplicate (diagonal). Shuffle shape: edge "
    "set joins a (doc_id, source) projection on doc_id - two "
    "digest-sized equi-joins, then a #sources^2-bounded aggregate; "
    "nothing quadratic in corpus size beyond the bucket-local pair "
    "generation itself.",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    src = table_parallel(spark, sf, "documents").select("doc_id", "source")
    e = _lsh_pairs(spark, sf)
    return (
        e.join(src.withColumnRenamed("doc_id", "da").withColumnRenamed("source", "sa"), "da")
        .join(src.withColumnRenamed("doc_id", "db").withColumnRenamed("source", "sb"), "db")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@register(
    "q115_graph_centrality",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
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
        deg AS (SELECT a, COUNT(*) AS outdeg FROM bi GROUP BY a),
        n AS (SELECT COUNT(*) AS nn FROM deg),
        r0 AS (SELECT a AS node, outdeg, 1.0 / nn AS rank FROM deg CROSS JOIN n),
        r1 AS (SELECT deg.a AS node, deg.outdeg,
                      0.15 / n.nn + 0.85 * COALESCE(m.mass, 0) AS rank
               FROM deg CROSS JOIN n
               LEFT JOIN (SELECT bi.b AS node, SUM(r0.rank / r0.outdeg) AS mass
                          FROM bi JOIN r0 ON r0.node = bi.a GROUP BY bi.b) m
                 ON m.node = deg.a),
        r2 AS (SELECT deg.a AS node, deg.outdeg,
                      0.15 / n.nn + 0.85 * COALESCE(m.mass, 0) AS rank
               FROM deg CROSS JOIN n
               LEFT JOIN (SELECT bi.b AS node, SUM(r1.rank / r1.outdeg) AS mass
                          FROM bi JOIN r1 ON r1.node = bi.a GROUP BY bi.b) m
                 ON m.node = deg.a),
        r3 AS (SELECT deg.a AS node, deg.outdeg,
                      0.15 / n.nn + 0.85 * COALESCE(m.mass, 0) AS rank
               FROM deg CROSS JOIN n
               LEFT JOIN (SELECT bi.b AS node, SUM(r2.rank / r2.outdeg) AS mass
                          FROM bi JOIN r2 ON r2.node = bi.a GROUP BY bi.b) m
                 ON m.node = deg.a)
        SELECT node, ROUND(rank, 6) AS rank FROM r3 ORDER BY node
    """,
    doc="Graph centrality (3-iteration PageRank, d=0.85) over the LSH "
    "near-dup edge set: rank measures how central a document is inside "
    "its duplicate cluster - the principled pick of a canonical "
    "representative for keep-one dedup (and, on a citation/link graph, "
    "the classic quality prior for corpus weighting). Spark side is "
    "the power method with one edge-join + one dst-keyed aggregate "
    "per round and per-round lineage truncation "
    "(operators/graph.py:pagerank); the oracle unrolls the identical "
    "three iterations as nested SQL CTEs - an independent evaluation "
    "of the same fixpoint sequence.",
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.operators.graph import pagerank

    e = _lsh_pairs(spark, sf)
    bi = e.select(F.col("da").alias("src"), F.col("db").alias("dst")).unionByName(
        e.select(F.col("db").alias("src"), F.col("da").alias("dst"))
    )
    return (
        pagerank(bi, n_iter=3)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )


@register(
    "q123_edit_distance_verify",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
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
            ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id)
        SELECT e.da, e.db,
               CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist
        FROM e
        JOIN documents ta ON ta.doc_id = e.da
        JOIN documents tb ON tb.doc_id = e.db
        ORDER BY da, db
    """,
    doc="Exact verification stage for the LSH dedup funnel: every "
    "candidate pair gets a true Levenshtein edit distance (JVM "
    "built-in, no UDF), turning probabilistic candidates into "
    "certified near-duplicates under whatever distance cutoff the "
    "pipeline applies. Candidates are bucket-local (linear), so the "
    "O(len^2) distance compute runs only on the bounded pair set; "
    "document text moves once per matched pair via doc_id equi-joins "
    "- the standard candidate-then-verify shape at 100 TB.",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents").select("doc_id", "text")
    e = _lsh_pairs(spark, sf)
    paired = e.join(
        docs.withColumnRenamed("doc_id", "da").withColumnRenamed("text", "ta"), "da"
    ).join(
        docs.withColumnRenamed("doc_id", "db").withColumnRenamed("text", "tb"), "db"
    )
    # The levenshtein projection is the expensive stage (O(len_a*len_b)
    # DP per pair), but AQE coalesces the small join output to ONE
    # partition by byte size, serializing all the DP work on a single
    # core (guide §2.5: byte-sized partitioning is wrong for compute-
    # bound stages). A deterministic hash repartition on the pair key
    # spreads the DP across the session's cores; at 100 TB the join
    # output is already many partitions and the exchange is pair-keyed
    # metadata + two texts per row — the candidate set, never the corpus.
    return (
        paired.repartition(
            spark.sparkContext.defaultParallelism, "da", "db"
        )
        .select(
            "da",
            "db",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
        .orderBy("da", "db")
    )


@register(
    "q132_incremental_neardup",
    oracle=f"""
        WITH sigh AS ({_minhash_sig_sql("WHERE doc_id % 10 < 8")}),
        sigd AS ({_minhash_sig_sql("WHERE doc_id % 10 >= 8")}),
        bh AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sigh) x),
        bd AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sigd) x),
        p AS (
          SELECT DISTINCT d.doc_id AS delta_id, h.doc_id AS hist_id
          FROM bd d JOIN bh h ON d.b = h.b AND d.band = h.band),
        flag AS (SELECT delta_id, COUNT(*) AS n_matches FROM p GROUP BY delta_id)
        SELECT s.source,
               CAST(COUNT(*) AS BIGINT) AS n_delta_docs,
               CAST(COUNT(f.delta_id) AS BIGINT) AS n_neardup,
               CAST(COALESCE(SUM(f.n_matches), 0) AS BIGINT) AS n_pairs
        FROM documents s LEFT JOIN flag f ON f.delta_id = s.doc_id
        WHERE s.doc_id % 10 >= 8
        GROUP BY s.source ORDER BY s.source
    """,
    doc="Incremental ingest near-dup check - the shape a 100 TB corpus "
    "actually runs daily: the arriving DELTA (doc_id % 10 >= 8 plays "
    "the new batch) is checked against the HISTORY's persisted LSH "
    "band index (doc_id % 10 < 8) without ever re-shingling or "
    "re-scanning history text - the band table IS the index, a "
    "(doc_id, band-hash) parquet artifact maintained by appending "
    "each day's delta bands (same pattern as the IVF index upsert). "
    "The delta-vs-history join is band-bucket-local like every LSH "
    "path here, and the output is the per-source admission report: "
    "arriving docs, how many near-duplicate history, candidate pair "
    "mass. Full-corpus re-dedup (q97) is the backfill path; this is "
    "the steady-state one.",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents")
    is_delta = F.col("doc_id") % 10 >= 8
    hist_bands = _band_table_of(docs.where(~is_delta)).localCheckpoint(eager=False)
    delta_bands = _band_table_of(docs.where(is_delta))
    p = (
        delta_bands.alias("d")
        .join(
            hist_bands.alias("h"),
            (F.col("d.b") == F.col("h.b")) & (F.col("d.band") == F.col("h.band")),
        )
        .select(F.col("d.doc_id").alias("delta_id"), F.col("h.doc_id").alias("hist_id"))
        .distinct()
    )
    flag = p.groupBy("delta_id").agg(F.count("*").alias("n_matches"))
    return (
        docs.where(is_delta)
        .select("doc_id", "source")
        .join(flag, F.col("doc_id") == F.col("delta_id"), "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_delta_docs"),
            F.count("delta_id").cast("long").alias("n_neardup"),
            F.coalesce(F.sum("n_matches"), F.lit(0)).cast("long").alias("n_pairs"),
        )
        .orderBy("source")
    )


@register(
    "q139_triangle_census",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql()}),
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
        deg AS (SELECT a AS node, COUNT(*) AS d FROM bi GROUP BY a),
        tri AS (
          SELECT COUNT(*) AS n_triangles
          FROM e e1 JOIN e e2 ON e2.da = e1.db
                    JOIN e e3 ON e3.da = e1.da AND e3.db = e2.db)
        SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
               CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
               CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
               CAST(tri.n_triangles AS BIGINT) AS n_triangles,
               ROUND(3.0 * tri.n_triangles
                     / NULLIF((SELECT SUM(d * (d - 1) / 2) FROM deg), 0), 6)
                 AS clustering_coeff
        FROM tri
    """,
    doc="Triangle census + global clustering coefficient over the LSH "
    "near-dup graph - the density diagnostic that tells a dedup "
    "pipeline whether its clusters are cliques (true duplicate "
    "groups, coeff near 1) or chains (drifting edits that transitive "
    "closure over-merges). Spark side uses the degree-ordered "
    "orientation (Schank-Wagner / MapReduce triangle counting): every "
    "edge points from its (degree, id)-smaller endpoint to the "
    "larger, so each triangle is generated exactly once from its "
    "unique orientation and the wedge join's fan-out per node is "
    "bounded by the oriented out-degree <= O(sqrt(m)) - the skew "
    "bound that makes triangle counting survive power-law graphs at "
    "100 TB, where id-ordered wedges would square the hub degrees. "
    "The DuckDB oracle counts via plain id-ordered 3-way self-join - "
    "orientation changes the plan, never the count.",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    e = _lsh_pairs(spark, sf).localCheckpoint(eager=False)
    bi = e.unionByName(e.select(F.col("db").alias("da"), F.col("da").alias("db")))
    deg = bi.groupBy("da").agg(F.count("*").alias("d")).withColumnRenamed("da", "node")

    ed = (
        e.join(deg.withColumnRenamed("node", "da").withColumnRenamed("d", "deg_a"), "da")
        .join(deg.withColumnRenamed("node", "db").withColumnRenamed("d", "deg_b"), "db")
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("da") < F.col("db"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("u"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("v"),
    ).localCheckpoint(eager=False)

    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    wedges = o1.join(o2, F.col("o2.u") == F.col("o1.v")).select(
        F.col("o1.u").alias("x"), F.col("o1.v").alias("y"), F.col("o2.v").alias("z")
    )
    tri = wedges.join(
        o3, (F.col("o3.u") == F.col("x")) & (F.col("o3.v") == F.col("z"))
    ).agg(F.count("*").alias("n_triangles"))

    census = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        )
    ).crossJoin(tri)
    return census.select(
        "n_edges",
        "n_nodes",
        "n_wedges",
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.round(
            3.0 * F.col("n_triangles") / F.when(F.col("n_wedges") > 0, F.col("n_wedges")),
            6,
        ).alias("clustering_coeff"),
    )


@register(
    "q224_cluster_representatives",
    oracle=f"""
        WITH RECURSIVE sig AS ({_minhash_sig_sql()}),
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
               FROM reach GROUP BY a),
        members AS (
          SELECT cc.cluster_id, cc.doc_id, d.n_chars
          FROM cc JOIN documents d ON d.doc_id = cc.doc_id
        )
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
               CAST(ARG_MAX(doc_id, n_chars * 10000000 - doc_id) AS BIGINT)
                 AS keeper_doc_id,
               CAST(MAX(n_chars) AS BIGINT) AS keeper_chars
        FROM members
        GROUP BY cluster_id ORDER BY cluster_id
    """,
    doc="Near-dup cluster REPRESENTATIVE selection: after LSH + "
    "connected components groups near-duplicates, each cluster "
    "keeps its best document (longest n_chars, ties to the "
    "smallest doc_id) — the keeper policy step between q97's "
    "cluster census and an actual emitted training corpus (q97 "
    "counts clusters; this decides WHICH document survives each "
    "one). Determinism: the keeper is an argmax on the packed "
    "integer key n_chars*1e7 − doc_id, so equal-length ties cannot "
    "be broken differently by different engines (the rounded-key-"
    "argmax rule). Plan shape: the per-cluster choice is one "
    "map-side-combinable max_by over the (doc_id, component) "
    "labels joined to a 2-column projection of documents — no "
    "window, no per-cluster sort, and document TEXT never joins "
    "in; at 100 TB the shuffle carries (cluster_id, doc_id, "
    "n_chars) triples only. Oracle replays LSH + a recursive-CTE "
    "closure + ARG_MAX on the identical packed key.",
)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents")
    # Shared session-memoized LSH + component labelling (_lsh_cc) — a
    # warm session that already ran the LSH/CC family (q75/q73/q117)
    # does not replay the minhash + hash-to-min loop here.
    cc = _lsh_cc(spark, sf)
    members = cc.join(
        docs.select("doc_id", "n_chars"),
        cc["node"] == F.col("doc_id"),
    )
    return (
        members.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max_by(
                "doc_id", F.col("n_chars") * 10_000_000 - F.col("doc_id")
            )
            .cast("long")
            .alias("keeper_doc_id"),
            F.max("n_chars").cast("long").alias("keeper_chars"),
        )
        .orderBy("cluster_id")
    )

@register(
    "q234_lsh_quality_eval",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql("WHERE doc_id < 200")}),
        bands AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sig) x),
        pred AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS shingles
          FROM (SELECT doc_id,
                       string_split_regex(lower(text), '\\s+') AS toks
                FROM documents WHERE doc_id < 200) t),
        truth AS (
          SELECT a.doc_id AS da, b.doc_id AS db
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
                / len(list_distinct(list_concat(a.shingles, b.shingles)))
                >= 0.5),
        j AS (
          SELECT COALESCE(p.da, t.da) AS da,
                 CASE WHEN p.da IS NOT NULL AND t.da IS NOT NULL THEN 'tp'
                      WHEN p.da IS NOT NULL THEN 'fp' ELSE 'fn' END AS cls
          FROM pred p
          FULL OUTER JOIN truth t ON t.da = p.da AND t.db = p.db)
        SELECT CAST(SUM(CASE WHEN cls = 'tp' THEN 1 ELSE 0 END) AS BIGINT)
                 AS tp,
               CAST(SUM(CASE WHEN cls = 'fp' THEN 1 ELSE 0 END) AS BIGINT)
                 AS fp,
               CAST(SUM(CASE WHEN cls = 'fn' THEN 1 ELSE 0 END) AS BIGINT)
                 AS fn,
               ROUND(SUM(CASE WHEN cls = 'tp' THEN 1 ELSE 0 END) * 1.0
                     / NULLIF(SUM(CASE WHEN cls IN ('tp', 'fp')
                                       THEN 1 ELSE 0 END), 0), 6)
                 AS precision,
               ROUND(SUM(CASE WHEN cls = 'tp' THEN 1 ELSE 0 END) * 1.0
                     / NULLIF(SUM(CASE WHEN cls IN ('tp', 'fn')
                                       THEN 1 ELSE 0 END), 0), 6)
                 AS recall
        FROM j
    """,
    doc="LSH quality evaluation: precision/recall of the engine's own "
    "MinHash/LSH candidate pairs against ground-truth 3-shingle "
    "Jaccard >= 0.5, on an explicit doc window — the measurement "
    "that turns the banding parameters (4 bands x 2 rows) from a "
    "formula-derived guess into an audited operating point, run "
    "periodically on a sampled window exactly like this while the "
    "full corpus uses the tuned parameters. Truth pairs come from "
    "the q33-pattern exploded shingle co-occurrence census (linear "
    "shuffle on (shingle, doc) pairs — no array cross-products); "
    "predicted pairs are the engine's real LSH path (_lsh_pairs_of) "
    "on the same window; a full outer join classifies tp/fp/fn. "
    "The window (doc_id < 200) bounds the quadratic truth side by "
    "construction; the LSH side is the production bucket-local "
    "plan.",
)
def q234(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents").where(F.col("doc_id") < 200)
    pred = _lsh_pairs_of(docs.select("doc_id", "text"))

    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles_spark())).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    jac = F.col("inter") * 1.0 / (F.col("sza") + F.col("szb") - F.col("inter"))
    truth = (
        inter.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .where(jac >= 0.5)
        .select(F.col("da").alias("ta"), F.col("db").alias("tb"))
    )
    j = pred.join(
        truth,
        (F.col("da") == F.col("ta")) & (F.col("db") == F.col("tb")),
        "full_outer",
    ).select(
        F.when(
            F.col("da").isNotNull() & F.col("ta").isNotNull(), "tp"
        )
        .when(F.col("da").isNotNull(), "fp")
        .otherwise("fn")
        .alias("cls")
    )
    tp = F.sum(F.when(F.col("cls") == "tp", 1).otherwise(0))
    fp = F.sum(F.when(F.col("cls") == "fp", 1).otherwise(0))
    fn = F.sum(F.when(F.col("cls") == "fn", 1).otherwise(0))
    return j.agg(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(tp * 1.0 / F.nullif(tp + fp, F.lit(0)), 6).alias("precision"),
        F.round(tp * 1.0 / F.nullif(tp + fn, F.lit(0)), 6).alias("recall"),
    )



@register(
    "q236_minhash_estimation_error",
    oracle=f"""
        WITH sig AS ({_minhash_sig_sql("WHERE doc_id < 200")}),
        bands AS (
          SELECT doc_id, b, band FROM (
            SELECT doc_id,
                   UNNEST([0, 1, 2, 3]) AS b,
                   UNNEST([md5(mh_0 || mh_1), md5(mh_2 || mh_3),
                           md5(mh_4 || mh_5), md5(mh_6 || mh_7)]) AS band
            FROM sig) x),
        pred AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id),
        est AS (
          SELECT p.da, p.db,
                 ((CASE WHEN sa.mh_0 = sb.mh_0 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_1 = sb.mh_1 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_2 = sb.mh_2 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_3 = sb.mh_3 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_4 = sb.mh_4 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_5 = sb.mh_5 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_6 = sb.mh_6 THEN 1 ELSE 0 END)
                + (CASE WHEN sa.mh_7 = sb.mh_7 THEN 1 ELSE 0 END)) AS nmatch
          FROM pred p
          JOIN sig sa ON sa.doc_id = p.da
          JOIN sig sb ON sb.doc_id = p.db),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS shingles
          FROM (SELECT doc_id,
                       string_split_regex(lower(text), '\\s+') AS toks
                FROM documents WHERE doc_id < 200) t),
        truth AS (
          SELECT e.da, e.db, e.nmatch,
                 len(list_intersect(a.shingles, b.shingles)) * 1.0
                 / len(list_distinct(list_concat(a.shingles, b.shingles)))
                   AS jac
          FROM est e
          JOIN sh a ON a.doc_id = e.da
          JOIN sh b ON b.doc_id = e.db)
        SELECT CAST(FLOOR(ABS(nmatch / 8.0 - jac) * 8) AS BIGINT)
                 AS err_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(AVG(ABS(nmatch / 8.0 - jac)), 6) AS mean_abs_err
        FROM truth
        GROUP BY err_bucket ORDER BY err_bucket
    """,
    doc="MinHash estimation-error audit: over the engine's own LSH "
    "candidate pairs (doc window < 200), the estimated Jaccard "
    "(fraction of the 8 minhashes that agree) against the TRUE "
    "3-shingle Jaccard, bucketed by absolute error in 1/8 steps "
    "with per-bucket mean absolute error — q234 audits the BANDING "
    "(which pairs become candidates); this audits the ESTIMATOR "
    "(how wrong the similarity value itself is at 8 permutations, "
    "expected sd ~ sqrt(J(1-J)/8)), the number that decides "
    "whether a downstream similarity threshold can act on the "
    "sketch or must re-verify exactly (q123's role). Candidate "
    "pairs only — the audit never goes quadratic; the truth side "
    "joins two bounded shingle sets per PAIR via the exploded "
    "census. Integer match counts and exact set sizes feed every "
    "division, so the 6-dp outputs are engine-stable.",
)
def q236(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents").where(F.col("doc_id") < 200)
    sig = _minhash_sig_spark(docs.select("doc_id", "text")).localCheckpoint(
        eager=False
    )
    pred = _lsh_pairs_of(docs.select("doc_id", "text"))
    sa = sig.select(
        F.col("doc_id").alias("da"),
        *[F.col(f"mh_{j}").alias(f"a{j}") for j in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"mh_{j}").alias(f"b{j}") for j in range(8)],
    )
    nmatch = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(8)
    )
    est = (
        pred.join(sa, "da").join(sb, "db").select("da", "db", nmatch.alias("nmatch"))
    )

    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(_shingles_spark())).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    x = sh.alias("x")
    y = sh.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db")
        )
        .agg(F.count("*").alias("inter"))
    )
    sza = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    szb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    jac = F.col("inter") * 1.0 / (F.col("sza") + F.col("szb") - F.col("inter"))
    truth = (
        est.join(inter, ["da", "db"], "left")
        .join(F.broadcast(sza), "da")
        .join(F.broadcast(szb), "db")
        .select(
            "da",
            "db",
            "nmatch",
            F.coalesce(jac, F.lit(0.0)).alias("jac"),
        )
    )
    err = F.abs(F.col("nmatch") / 8.0 - F.col("jac"))
    return (
        truth.groupBy(
            F.floor(err * 8).cast("long").alias("err_bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.avg(err), 6).alias("mean_abs_err"),
        )
        .orderBy("err_bucket")
    )




_CT_SH = 5  # containment shingle width in tokens
_CT_DF = 20  # rare-shingle document-frequency cap
_CT_MIN = 0.6


@register(
    "q264_containment_quotes",
    oracle=rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts
          FROM documents
        ),
        sh0 AS (
          SELECT doc_id,
                 array_to_string(ts[i : i + {_CT_SH} - 1], ' ') AS sh
          FROM toks, unnest(generate_series(1, len(ts) - {_CT_SH} + 1)) AS g(i)
        ),
        sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
        df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        rare AS (
          SELECT s.doc_id, s.sh FROM sh s JOIN df d ON d.sh = s.sh
          WHERE d.df <= {_CT_DF}
        ),
        sz AS (SELECT doc_id, COUNT(*) AS nsh FROM rare GROUP BY doc_id),
        com AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common
          FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.a_id, c.b_id,
               CAST(c.common AS BIGINT) AS common,
               ROUND(c.common * 1.0 / LEAST(sa.nsh, sb.nsh), 6) AS containment
        FROM com c
        JOIN sz sa ON sa.doc_id = c.a_id
        JOIN sz sb ON sb.doc_id = c.b_id
        WHERE c.common * 1.0 / LEAST(sa.nsh, sb.nsh) >= {_CT_MIN}
        ORDER BY containment DESC, a_id, b_id
    """,
    doc=f"CONTAINMENT detection (quotation / near-subset pairs): "
    f"{_CT_SH}-token shingle sets, pair overlap counted only over "
    f"RARE shingles (document frequency <= {_CT_DF}), scored as "
    f"|A∩B| / min(|A|,|B|) >= {_CT_MIN}. The asymmetric complement "
    "of the Jaccard dedup family (q33/q86): a short document quoted "
    "inside a long one has near-total containment but low Jaccard, "
    "so symmetric dedup keeps BOTH copies and the training set "
    "still memorizes the quoted text. Scale shape: the pair "
    "generator is the exploded-shingle EQUI-join — and the rare-"
    "shingle filter is what bounds it: a shingle with df <= c "
    "contributes <= c^2 candidate rows, so boilerplate shingles "
    "shared by thousands of documents (the quadratic hot keys) are "
    "excluded BEFORE the self-join, exactly the skew cure the "
    "banded-LSH path gets from adaptive banding. Everything is "
    "integer counts; the one containment division is replayed "
    "identically by the oracle, ranked rounded with id tiebreaks.",
)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    toks = table(spark, sf, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("ts")
    )
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(ts) - {_CT_SH} + 1, 0)),"
                    f" i -> array_join(slice(ts, i, {_CT_SH}), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
        # two consumers (census, rare filter) — shingle once
        .localCheckpoint(eager=False)
    )
    df = sh.groupBy("sh").agg(F.count("*").alias("df"))
    rare = (
        sh.join(df.where(F.col("df") <= _CT_DF), "sh")
        .select("doc_id", "sh")
        # three consumers (sizes + both self-join sides)
        .localCheckpoint(eager=False)
    )
    sz = rare.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = rare.select(F.col("doc_id").alias("a_id"), "sh")
    b = rare.select(F.col("doc_id").alias("b_id"), "sh")
    com = (
        a.join(b, "sh")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("common"))
    )
    return (
        com.join(
            sz.select(F.col("doc_id").alias("a_id"), F.col("nsh").alias("na")),
            "a_id",
        )
        .join(
            sz.select(F.col("doc_id").alias("b_id"), F.col("nsh").alias("nb")),
            "b_id",
        )
        .withColumn("containment", F.col("common") / F.least("na", "nb"))
        .where(F.col("containment") >= _CT_MIN)
        .select(
            "a_id",
            "b_id",
            F.col("common").cast("long").alias("common"),
            F.round("containment", 6).alias("containment"),
        )
        .orderBy(F.desc("containment"), "a_id", "b_id")
    )


_WIN_K = 4  # winnowing k-gram size (tokens)
_WIN_W = 4  # winnowing window of consecutive k-gram hashes
_WIN_MIN_SHARED = 2


@register(
    "q322_winnowing_fingerprints",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, t.tok AS tok, t.pos AS pos
          FROM documents,
               LATERAL (SELECT UNNEST(string_split_regex(lower(text),
                                      '[^a-z]+')) AS tok,
                        generate_subscripts(
                          string_split_regex(lower(text), '[^a-z]+'), 1)
                          AS pos
               ) t
          WHERE t.tok <> ''
        ),
        seq AS (
          SELECT doc_id, pos,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
          FROM tok
        ),
        gram AS (
          SELECT s.doc_id, s.rn,
                 CAST(('0x' || substr(md5(string_agg(t2.tok, ' '
                         ORDER BY t2.rn)), 1, 12)) AS BIGINT) AS h
          FROM seq s
          JOIN (SELECT q.doc_id, q.rn, k.tok
                FROM seq q JOIN tok k
                  ON k.doc_id = q.doc_id AND k.pos = q.pos) t2
            ON t2.doc_id = s.doc_id
           AND t2.rn BETWEEN s.rn AND s.rn + {_WIN_K} - 1
          GROUP BY s.doc_id, s.rn
          HAVING COUNT(*) = {_WIN_K}
        ),
        win AS (
          SELECT doc_id,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY rn
                              ROWS BETWEEN CURRENT ROW
                              AND {_WIN_W - 1} FOLLOWING) AS fp,
                 rn,
                 COUNT(*) OVER (PARTITION BY doc_id) AS ng
          FROM gram
        ),
        fps AS (
          SELECT DISTINCT doc_id, fp
          FROM win WHERE rn <= ng - {_WIN_W} + 1
        ),
        pairs AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY da, db
          HAVING COUNT(*) >= {_WIN_MIN_SHARED}
        )
        SELECT CAST(da AS BIGINT) AS da, CAST(db AS BIGINT) AS db,
               CAST(shared AS BIGINT) AS shared_fingerprints
        FROM pairs
        ORDER BY shared DESC, da, db
        LIMIT 15
    """,
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken "
    f"2003, the MOSS algorithm): hash every {_WIN_K}-token gram, keep "
    f"the MINIMUM hash of each window of {_WIN_W} consecutive grams — "
    "the guarantee is that any shared substring of length >= "
    "k + w - 1 tokens produces at least one shared fingerprint, so "
    "LOCAL plagiarism/quotation overlap is caught where q41's "
    "whole-document bag hash (document must match entirely) and "
    "q34's MinHash (global set similarity must be high) both miss "
    "it; density is ~2/(w+1) of all grams, so the index is a "
    "fraction of a full k-gram posting list. Top-15 pairs by shared "
    "fingerprints. Plan shape: tokenize-explode, k-grams via "
    "doc-partitioned LEAD windows (per-key parallel), window-min "
    "selection, distinct fingerprint census, pair generation ONLY "
    "through the fingerprint equi-join (the LSH-family bucket "
    "discipline, cartesian guard pinned).",
)
def q322(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from harmony_spark.io import table_parallel

    toks = F.split(F.lower(F.col("text")), r"[^a-z]+")
    tok = (
        table_parallel(spark, sf, "documents")
        .select("doc_id", F.posexplode(toks).alias("pos0", "tok"))
        .where(F.col("tok") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    gram_txt = F.concat_ws(
        " ",
        F.col("tok"),
        *[F.lead("tok", i).over(w) for i in range(1, _WIN_K)],
    )
    gram = (
        tok.select(
            "doc_id",
            F.row_number().over(w).alias("rn"),
            gram_txt.alias("g"),
            F.lead("tok", _WIN_K - 1).over(w).alias("last_tok"),
        )
        .where(F.col("last_tok").isNotNull())
        .select(
            "doc_id",
            "rn",
            F.conv(F.substring(F.md5("g"), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    wf = Window.partitionBy("doc_id").orderBy("rn").rowsBetween(
        0, _WIN_W - 1
    )
    wc = Window.partitionBy("doc_id")
    win = gram.select(
        "doc_id",
        "rn",
        F.min("h").over(wf).alias("fp"),
        F.count("*").over(wc).alias("ng"),
    )
    fps = (
        win.where(F.col("rn") <= F.col("ng") - _WIN_W + 1)
        .select("doc_id", "fp")
        .distinct()
    )
    a, b = fps.alias("a"), fps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= _WIN_MIN_SHARED)
    )
    return (
        pairs.select(
            F.col("da").cast("long").alias("da"),
            F.col("db").cast("long").alias("db"),
            F.col("shared").cast("long").alias("shared_fingerprints"),
        )
        .orderBy(F.desc("shared_fingerprints"), "da", "db")
        .limit(15)
    )


_SPAN_K = 50  # Lee et al. 2022 exact-substring threshold (tokens)


@register(
    "q358_exact_span_dedup",
    oracle=r"""
        WITH toks AS (SELECT doc_id,
                             string_split_regex(lower(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT doc_id, u.pos AS pos, u.g AS g
               FROM (SELECT doc_id,
                            unnest(list_transform(range(1, len(t) - 48),
                                   i -> {'pos': i,
                                         'g': md5(array_to_string(
                                                  t[i:i+49], ' '))})) AS u
                     FROM toks WHERE len(t) >= 50)),
        dupg AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) > 1),
        dup AS (SELECT doc_id, pos FROM sh WHERE g IN (SELECT g FROM dupg)),
        runs AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                                ORDER BY pos) <= 50
                      THEN 0 ELSE 1 END AS brk
          FROM dup),
        spans AS (
          SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
          FROM runs),
        sl AS (SELECT doc_id, sid, MAX(pos) - MIN(pos) + 50 AS span_len
               FROM spans GROUP BY doc_id, sid)
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_affected,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(COALESCE(SUM(span_len), 0) AS BIGINT)
                 AS total_dup_tokens,
               CAST(COALESCE(MAX(span_len), 0) AS BIGINT)
                 AS max_span_tokens
    FROM sl
    """,
    doc=f"Exact substring-SPAN dedup (Lee et al. 2022 'Deduplicating "
    f"Training Data', the suffix-array ExactSubstr operator re-expressed "
    f"relationally): a {_SPAN_K}-token window is duplicated iff its "
    f"{_SPAN_K}-gram occurs more than once corpus-wide (multiplicity, "
    "not distinct-doc count — within-doc repeats count, exactly as a "
    "suffix array sees them); per document, overlapping/adjacent "
    "duplicated windows merge into MAXIMAL duplicate spans via a "
    "gap<=K run-merge over window start positions — the relational "
    "equivalent of reading maximal repeated intervals off the suffix "
    "array. Output census: affected docs, span count, total duplicated "
    "tokens (what ExactSubstr would cut), longest span. Plan: row-local "
    f"posexplode of md5({_SPAN_K}-gram) digests (the shuffle carries "
    "16-byte hashes, never token strings), one multiplicity aggregate, "
    "a semi-join back, then doc-bounded windows (documents have bounded "
    "length, so per-doc partitions never skew). Complements q86's "
    "8-token shingle census (which counts shared shingles but cannot "
    "merge them into maximal spans). Reference shape: "
    "extensions/dedup.py q86; the span merge is new here.",
)
def q358(spark: SparkSession, sf: str) -> DataFrame:
    shingles = F.expr(
        f"transform(sequence(0, size(toks) - {_SPAN_K}), "
        f"i -> named_struct('pos', i + 1, "
        f"'g', md5(concat_ws(' ', slice(toks, i + 1, {_SPAN_K})))))"
    )
    sh = (
        table_parallel(spark, sf, "documents")
        .select("doc_id", _tokens().alias("toks"))
        .where(F.size("toks") >= _SPAN_K)
        .select("doc_id", F.explode(shingles).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )
    dup_g = sh.groupBy("g").agg(F.count("*").alias("c")).where(F.col("c") > 1)
    dup = sh.join(dup_g.select("g"), "g", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dup.withColumn(
        "brk",
        F.when(
            F.col("pos") - F.lag("pos").over(w) <= _SPAN_K, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    spans = runs.withColumn("sid", F.sum("brk").over(w))
    sl = spans.groupBy("doc_id", "sid").agg(
        (F.max("pos") - F.min("pos") + _SPAN_K).alias("span_len")
    )
    return sl.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs_affected"),
        F.count("*").cast("long").alias("n_spans"),
        F.coalesce(F.sum("span_len"), F.lit(0))
        .cast("long")
        .alias("total_dup_tokens"),
        F.coalesce(F.max("span_len"), F.lit(0))
        .cast("long")
        .alias("max_span_tokens"),
    )
