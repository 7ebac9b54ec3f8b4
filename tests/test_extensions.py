"""Engine tests for extension operators that are not oracle-checked:
LSH-bucketed ANN end-to-end, multimodal decode/embed/frame plumbing,
and MLlib MinHashLSH as an alternative near-dup path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from harmony_spark.extensions import multimodal, similarity
from harmony_spark.registry import load_all


def test_bucketed_ann_subset_of_bruteforce(spark, sf_dir):
    """Bucketed ANN results must be the brute-force ranking restricted
    to the query's bucket (both halves are oracle-checked; this pins
    their composition)."""
    ann = {
        (r["q_id"], r["c_id"]): r["cos"]
        for r in similarity.bucketed_ann(spark, sf_dir).collect()
    }
    brute = {
        (r["q_id"], r["c_id"]): r["cos"]
        for r in load_all()["q37_cosine_topk"].fn(spark, sf_dir).collect()
    }
    assert ann, "bucketed ANN returned nothing"
    for pair, cos in ann.items():
        if pair in brute:
            assert abs(brute[pair] - cos) < 1e-9


def test_multimodal_blob_pipeline(spark, sf_dir):
    blobs = multimodal.blobs_from_documents(spark, sf_dir)
    meta = multimodal.attach_blob_metadata(blobs)
    row = meta.orderBy("blob_id").first()
    assert row["byte_size"] > 0 and len(row["digest"]) == 32
    assert row["format"] == "unknown"  # text bytes, no magic header

    emb = multimodal.decode_and_embed(blobs).orderBy("blob_id")
    rows = emb.limit(5).collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    # deterministic across runs
    rows2 = multimodal.decode_and_embed(blobs).orderBy("blob_id").limit(5).collect()
    assert [r["embedding"] for r in rows] == [r["embedding"] for r in rows2]

    # real decode path is an explicit stub
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.decode_and_embed(blobs, decode="real").first()


def test_frame_sampling_shape(spark, sf_dir):
    blobs = multimodal.blobs_from_documents(spark, sf_dir)
    frames = multimodal.sample_frames(blobs, n_frames=4)
    per_blob = frames.groupBy("blob_id").count().collect()
    assert all(r["count"] == 4 for r in per_blob)
    first = frames.where(F.col("blob_id") == 0).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in first] == [0, 1, 2, 3]
    assert all(r["offset"] >= 0 for r in first)


def test_mllib_minhash_lsh_agrees_with_exact_jaccard(spark, sf_dir):
    """ml.feature.MinHashLSH as the library path for near-dup: pairs it
    reports below distance 0.2 must have exact token-set Jaccard >= 0.8
    (cross-check against the q33 exact kernel)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 40)
        .select("doc_id", F.array_distinct(F.split(F.lower("text"), r"\s+")).alias("toks"))
    )
    cv = CountVectorizer(inputCol="toks", outputCol="vec", binary=True).fit(docs)
    vecs = cv.transform(docs)
    lsh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=8, seed=42).fit(vecs)
    pairs = (
        lsh.approxSimilarityJoin(vecs, vecs, 0.2, distCol="jd")
        .where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("da"),
            F.col("datasetB.doc_id").alias("db"),
            "jd",
        )
        .collect()
    )
    exact = {
        (r["da"], r["db"]): r["jaccard"]
        for r in load_all()["q33_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    assert pairs, "MinHashLSH found no candidate pairs"
    for r in pairs:
        key = (r["da"], r["db"])
        assert key in exact and exact[key] >= 0.8 - 1e-6, (key, r["jd"])


def test_pandas_udf_surface_matches_expression_kernels(spark, sf_dir):
    """Scalar pandas_udf cosine/L2 must agree with the expression-HOF
    implementations that back q04/q31."""
    from harmony_spark.functions.udfs import cosine_udf, l2_norm_udf
    from harmony_spark.extensions.similarity import _dot, _l2

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") < 20)
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("va") < F.col("vb"))
    got = pairs.select(
        "va", "vb",
        cosine_udf("ea", "eb").alias("c_udf"),
        (_dot("ea", "eb") / (_l2("ea") * _l2("eb"))).alias("c_expr"),
        l2_norm_udf("ea").alias("n_udf"),
        _l2("ea").alias("n_expr"),
    ).collect()
    assert got
    for r in got:
        assert abs(r["c_udf"] - r["c_expr"]) < 1e-9
        assert abs(r["n_udf"] - r["n_expr"]) < 1e-9


def test_applyinpandas_grouped_zscore_matches_window(spark, sf_dir):
    """Grouped-map applyInPandas z-score == the q05 window-function
    z-score (same math, different execution vehicle)."""
    from harmony_spark.functions.udfs import grouped_zscore
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        (r["o_custkey"], r["value"]): r["z"]
        for r in grouped_zscore(orders, "o_custkey", "o_totalprice").collect()
    }
    w = Window.partitionBy("o_custkey")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.nullif(
        F.stddev_samp("o_totalprice").over(w), F.lit(0.0)
    )
    want = orders.select(
        "o_custkey", F.col("o_totalprice").alias("value"),
        F.greatest(F.least(z, F.lit(10.0)), F.lit(-10.0)).alias("z"),
    ).collect()
    assert len(got) >= len(want) - 5  # dict collapses duplicate (key, value) pairs
    for r in want:
        k = (r["o_custkey"], r["value"])
        if k in got:
            if r["z"] is None:
                import math
                assert got[k] is None or math.isnan(got[k])
            else:
                assert abs(got[k] - r["z"]) < 1e-9


def test_package_top_level_exports_resolve():
    import harmony_spark as h

    for name in h.__all__:
        assert getattr(h, name) is not None, name


def test_q89_prefix_filter_is_lossless(spark, sf_dir):
    """Prefix filtering must be an optimization, not an approximation:
    the filtered join's result set equals the naive all-pairs exact
    Jaccard join (threshold 0.6) on the same corpus."""
    import pyspark.sql.functions as F

    from harmony_spark.extensions.dedup import _tokens, prefix_filtered_pairs
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents")
    got = {
        (r["da"], r["db"], r["jac"]) for r in prefix_filtered_pairs(docs).collect()
    }

    toks = docs.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("tok"))
    sz = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sz.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    jac = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    naive = {
        (r["da"], r["db"], r["jac"])
        for r in inter.join(sa, "da")
        .join(sb, "db")
        .where(jac >= 0.6)
        .select("da", "db", F.round(jac, 6).alias("jac"))
        .collect()
    }
    assert got == naive
    assert len(naive) > 0  # corpus must actually contain near-dups


def test_int8_quantized_topk_recall(spark, sf_dir):
    """Two-stage retrieval: int8-quantized dot-product shortlist must
    recover most of the exact float cosine top-5 (recall@5 >= 0.7
    averaged over queries) at 4x smaller storage."""
    import pyspark.sql.functions as F

    from harmony_spark.extensions.similarity import quantize_embeddings, quantized_topk
    from harmony_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    qdf, mins, spans = quantize_embeddings(emb)
    assert dict(qdf.dtypes)["qemb"] == "array<tinyint>"
    queries = [0, 1, 2, 3, 4]
    got = quantized_topk(qdf, queries, k=5)
    approx = {}
    for r in got.collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])

    # exact float cosine top-5 (normalized dot = cosine ranking)
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    base = emb.select("vec_id", "embedding", norm.alias("nrm"))
    q = base.where(F.col("vec_id").isin(queries)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    dot = F.aggregate(
        F.zip_with("embedding", "q_emb", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        (F.col("dot") / (F.col("nrm") * F.col("q_nrm"))).desc(), F.col("vec_id")
    )
    exact_rows = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", dot.alias("dot"), "nrm", "q_nrm")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .collect()
    )
    exact = {}
    for r in exact_rows:
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])

    recalls = [len(approx[qid] & exact[qid]) / 5 for qid in exact]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_q92_refinement_only_splits_buckets(spark, sf_dir):
    """Adaptive banding may only PRUNE candidate pairs relative to plain
    banding (q35) — splitting a bucket can never invent a pair — and at
    the forced-low threshold the re-keying must actually fire. (On this
    corpus the hot buckets are EXACT duplicates — all 8 minhashes equal —
    so the extended key keeps them together and the pair sets coincide;
    that is the correct behavior, not a missed split.)"""
    from harmony_spark.extensions.dedup import adaptive_band_table
    from harmony_spark.io import table_parallel
    from harmony_spark.registry import load_all

    qs = load_all()
    plain = {(r["da"], r["db"]) for r in qs["q35_minhash_lsh_pairs"].fn(spark, sf_dir).collect()}
    adaptive = {
        (r["da"], r["db"]) for r in qs["q92_adaptive_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    assert adaptive <= plain
    assert len(adaptive) > 0
    keyed = adaptive_band_table(table_parallel(spark, sf_dir, "documents"), hot_threshold=2)
    n_rekeyed = keyed.where("lvl").count()
    assert n_rekeyed > 2  # hot buckets exist and were re-keyed


def test_pq_topk_recall(spark, sf_dir):
    """IVF-PQ two-stage retrieval: recall@5 vs the exact float cosine
    top-k must clear 0.6 on the test corpus (measured ~0.8-0.84 at
    shortlist=100; a broken encoder/LUT collapses to ~0.01 = chance),
    and the encode stage must stay codegen-only (no Python eval node)."""
    import numpy as np
    from pyspark.sql import functions as F

    from harmony_spark.extensions.similarity import pq_encode, pq_topk, train_pq_codebooks
    from harmony_spark.io import table

    qids = [0, 1, 2, 3, 4]
    out = pq_topk(spark, sf_dir, qids).collect()
    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([r["embedding"] for r in rows]).astype("float64")
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    recalls = []
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        cos = Xn @ Xn[qi]
        cos[qi] = -9
        exact = set(ids[np.argsort(-cos)][:5].tolist())
        got = {r["c_id"] for r in out if r["q_id"] == q}
        assert len(got) == 5
        recalls.append(len(exact & got) / 5)
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    e = table(spark, sf_dir, "embeddings")
    enc = pq_encode(e, train_pq_codebooks(e)).select("vec_id", "pq_code")
    assert "BatchEvalPython" not in enc._jdf.queryExecution().executedPlan().toString()
    lo, hi = enc.select(
        F.min(F.array_min("pq_code")), F.max(F.array_max("pq_code"))
    ).first()
    assert 0 <= lo and hi <= 15  # 4-bit codes


def test_adaptive_srp_bounds_hot_buckets(spark, sf_dir):
    """The q98 skew guard: SRP buckets over the hot threshold must be
    re-keyed on extra projection bits, and the re-keying must strictly
    shrink the worst bucket — i.e. the |B|^2 pair fan-out of the
    candidate self-join is bounded at the keying stage, mirroring the
    minhash-side guarantee (test_q92_refinement_only_splits_buckets)."""
    from pyspark.sql import functions as F

    from harmony_spark.extensions.similarity import _bucket_spark, adaptive_srp_table
    from harmony_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    thr = 30  # forced low enough that several buckets are hot at sf0.001
    raw_sizes = {
        r["bucket"]: r["n"]
        for r in emb.select(_bucket_spark().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hot_raw = {b: n for b, n in raw_sizes.items() if n > thr}
    assert hot_raw, "fixture must contain hot buckets for the guard to exercise"

    keyed = adaptive_srp_table(emb, hot_threshold=thr)
    keyed_sizes = (
        keyed.groupBy("lvl", "key").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert keyed.where("lvl").count() == sum(hot_raw.values())  # re-keying fired
    max_hot_after = max((r["n"] for r in keyed_sizes if r["lvl"]), default=0)
    assert max_hot_after < max(hot_raw.values()), (
        f"hot bucket not split: worst raw {max(hot_raw.values())} vs "
        f"worst refined {max_hot_after}"
    )
    # pair fan-out sum(n*(n-1)/2) must strictly drop on the hot portion
    pairs_before = sum(n * (n - 1) // 2 for n in hot_raw.values())
    pairs_after = sum(r["n"] * (r["n"] - 1) // 2 for r in keyed_sizes if r["lvl"])
    assert pairs_after < pairs_before
    # cold buckets keep their short key untouched (full recall there)
    cold = keyed.where(~F.col("lvl")).select("key").distinct().collect()
    assert all(len(r["key"]) == 4 for r in cold)


def test_q89_mask_and_array_paths_agree(spark, sf_dir):
    """The two physical strategies of prefix_filtered_pairs_exact are
    ONE semantics: on a corpus where the bitmask path applies (vocab
    <= 62), forcing the array path must produce the identical
    (da, db, i, u) set."""
    from pyspark.sql import functions as F

    from harmony_spark.extensions.dedup import (
        _array_pairs,
        _tokens,
        prefix_filtered_pairs_exact,
    )
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    via_dispatch = sorted(
        tuple(r) for r in prefix_filtered_pairs_exact(docs).collect()
    )
    sets = docs.select(
        "doc_id", F.array_sort(F.array_distinct(_tokens())).alias("ts")
    ).withColumn("sz", F.size("ts"))
    toks = sets.select("doc_id", F.explode("ts").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    prefix_len = F.col("sz") - F.floor((3 * F.col("sz") + 4) / 5) + 1
    via_array = sorted(
        tuple(r) for r in _array_pairs(sets, toks, dfreq, prefix_len).collect()
    )
    assert via_dispatch == via_array and len(via_dispatch) > 0


def test_pca_explained_variance(spark, sf_dir):
    """PCA over the distributed covariance must match a straight NumPy
    eigendecomposition of the densely-computed covariance."""
    import numpy as np

    from harmony_spark.extensions.similarity import pca_explained_variance
    from harmony_spark.io import table

    got = pca_explained_variance(table(spark, sf_dir, "embeddings"), k=5)
    x = np.stack(
        table(spark, sf_dir, "embeddings").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    c = np.cov(x, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(c)[::-1]
    want = w[:5] / w.sum()
    assert np.allclose(got, want, atol=1e-5)
    assert all(a >= b for a, b in zip(got, got[1:]))  # sorted desc


def test_merge_upsert_laws(spark):
    """MERGE semantics invariants: empty source is identity; a pure
    insert grows the target by |source|; an update changes values but
    never cardinality; unmatched target rows always pass through."""
    import pyspark.sql.functions as F

    from harmony_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    empty = spark.createDataFrame([], "k long, d double")
    out = merge_upsert(target, empty, "k", {"v": F.col("t.v") + F.col("s.d")},
                       {"k": F.col("s.k"), "v": F.col("s.d")})
    assert sorted(map(tuple, out.collect())) == [(1, 10.0), (2, 20.0), (3, 30.0)]

    inserts = spark.createDataFrame([(4, 40.0), (5, 50.0)], "k long, d double")
    out = merge_upsert(target, inserts, "k", {"v": F.col("t.v") + F.col("s.d")},
                       {"k": F.col("s.k"), "v": F.col("s.d")})
    assert sorted(map(tuple, out.collect())) == [
        (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)]

    updates = spark.createDataFrame([(2, 5.0)], "k long, d double")
    out = merge_upsert(target, updates, "k", {"v": F.col("t.v") + F.col("s.d")},
                       {"k": F.col("s.k"), "v": F.col("s.d")})
    assert sorted(map(tuple, out.collect())) == [(1, 10.0), (2, 25.0), (3, 30.0)]


def test_ivf_index_upsert_searchable(spark, sf_dir, tmp_path):
    """Incremental maintenance: a vector appended via ivf_index_upsert
    must be retrievable immediately — a near-clone of vector 7 has to
    surface as its top neighbor — and only its own cell partition may
    gain files."""
    import os

    import pyspark.sql.functions as F

    from harmony_spark.io import table
    from harmony_spark.operators.advanced import (
        _ivf_scored,
        build_ivf_index,
        ivf_index_upsert,
        ivf_search,
    )

    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(spark, sf_dir, idx)
    files_before = {
        d: len(os.listdir(os.path.join(idx, d)))
        for d in os.listdir(idx)
        if d.startswith("cid=")
    }

    base = table(spark, sf_dir, "embeddings").where(F.col("vec_id") == 7)
    clone = base.select(
        F.lit(100000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
    )
    ivf_index_upsert(spark, idx, clone)

    files_after = {
        d: len(os.listdir(os.path.join(idx, d)))
        for d in os.listdir(idx)
        if d.startswith("cid=")
    }
    changed = [d for d in files_after if files_after[d] != files_before.get(d, 0)]
    assert len(changed) == 1  # append touched exactly the clone's cell

    queries = _ivf_scored(spark, sf_dir).where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("n").alias("qn"),
        "scores",
    )
    got = ivf_search(spark, idx, queries).collect()
    assert got[0]["c_id"] == 100000  # the near-clone is the top neighbor
    assert got[0]["cos"] > 0.999


def test_read_epochs_widens_types(spark, sf_dir, tmp_path):
    """Type widening across epochs: an int32/float32 epoch conforms to
    the long/double target via per-epoch CAST — the case parquet
    mergeSchema refuses outright."""
    from pyspark.sql import functions as F
    from harmony_spark.io import read_epochs, table

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    even = F.col("c_custkey") % 2 == 0
    cust.where(even).select(
        F.col("c_custkey").cast("int").alias("c_custkey"),
        F.col("c_acctbal").cast("float").alias("c_acctbal"),
    ).write.parquet(p1)
    cust.where(~even).write.parquet(p2)

    out = read_epochs(spark, [p1, p2], cust.schema)
    assert [f.dataType.typeName() for f in out.schema.fields] == ["long", "double"]
    assert out.count() == cust.count()
    # narrowed epoch-1 floats widen back losslessly for these 2-decimal
    # balances only when they fit float32's mantissa; check keys exactly
    # and balances to float32 precision
    got = {r["c_custkey"]: r["c_acctbal"] for r in out.collect()}
    want = {r["c_custkey"]: r["c_acctbal"] for r in cust.collect()}
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-2 * max(1.0, abs(want[k])) for k in want)


def test_read_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    """Malformed JSONL lines land in the dead-letter channel with their
    raw text; good lines parse fully — no silent drops, no job failure."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from harmony_spark.io import read_jsonl_quarantine

    path = str(tmp_path / "docs.jsonl")
    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "beta"}',
        '{"doc_id": "not-a-number", "text": "gamma"}',
        '{"doc_id": 3, "text": "delta"}',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, bad = read_jsonl_quarantine(spark, path, schema)
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 3}
    raw = [r["raw_line"] for r in bad.collect()]
    assert len(raw) == 2
    assert "not json at all" in raw[0] or "not json at all" in raw[1]


def test_variant_roundtrips_parquet(spark, sf_dir, tmp_path):
    """The parse-at-ingest model only works if VARIANT survives storage:
    write the parsed column to parquet, read back, typed access must
    equal direct json extraction on the strings."""
    from pyspark.sql import functions as F
    from harmony_spark.io import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "props", F.parse_json("props").alias("pv")
    )
    path = str(tmp_path / "variant.parquet")
    ev.select("event_id", "pv").write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["pv"] == "variant"
    got = {
        r["event_id"]: r["k"]
        for r in back.select(
            "event_id", F.variant_get("pv", "$.k", "int").alias("k")
        ).collect()
    }
    want = {
        r["event_id"]: r["k"]
        for r in ev.select(
            "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_greedy_coverage_matches_python_replica(spark, sf_dir):
    """q154's distributed greedy loop must make the exact same picks as
    a driver-side Python replica of greedy max-coverage (ties ->
    smallest doc_id)."""
    from pyspark.sql import functions as F

    from harmony_spark.extensions.curation import greedy_coverage_picks
    from harmony_spark.io import table

    doc_tok = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    got = greedy_coverage_picks(doc_tok, k=6)

    pairs = [(r["doc_id"], r["tok"]) for r in doc_tok.collect()]
    by_doc: dict[int, set] = {}
    for d, t in pairs:
        by_doc.setdefault(d, set()).add(t)
    covered: set = set()
    want = []
    for i in range(6):
        best = max(
            by_doc, key=lambda d: (len(by_doc[d] - covered), -d)
        )
        gain = len(by_doc[best] - covered)
        if gain == 0:
            break
        want.append((i + 1, best, gain))
        covered |= by_doc[best]
    assert got == want
    # submodularity: marginal gains never increase
    gains = [g for _, _, g in got]
    assert all(b <= a for a, b in zip(gains, gains[1:]))


def test_read_epochs_rejects_empty_list(spark):
    from pyspark.sql.types import StructType

    from harmony_spark.io import read_epochs

    with pytest.raises(ValueError):
        read_epochs(spark, [], StructType([]))
