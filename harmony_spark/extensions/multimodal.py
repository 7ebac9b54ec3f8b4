"""Multimodal columns (SURVEY.md §2.10): image/audio/video as opaque
BINARY columns with typed metadata, processed via Arrow-batched
mapInPandas.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual media decode is STUBBED because
no image/audio library ships in this container:

  * ``decode=\"fake\"`` (default in tests): a deterministic md5-seeded
    decoder that produces stable pseudo-pixels/waveforms, so the full
    pipeline (bytes -> decode -> feature-extract -> embed) is exercised
    end to end with reproducible outputs.
  * ``decode=\"real\"``: raises NotImplementedError at the decode step
    with the exact swap-in point documented (plug Pillow/librosa/pyav
    inside ``_decode_batch``; nothing else changes).

Blob metadata extraction (q43) is pure column expressions and fully
oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table, table_parallel
from harmony_spark.registry import register

_MAGIC = {
    b"\x89PN": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIF": "riff",  # wav/avi family
    b"ID3": "mp3",
}


def blobs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an opaque-blob table from documents: the engine treats
    blob contents as bytes end-to-end (the testdata ships no real media,
    so text bytes stand in; every operator below only touches the BINARY
    column)."""
    return table_parallel(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("blob_id"),
        F.col("text").cast("binary").alias("blob"),
        F.col("source").alias("origin"),
    )


def attach_blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata columns from the raw bytes: size, content digest,
    sniffed container format (magic bytes). Pure JVM expressions."""
    magic = F.substring(F.col(blob_col), 1, 3)
    fmt = F.lit("unknown")
    for sig, name in _MAGIC.items():
        fmt = F.when(magic == F.lit(sig), F.lit(name)).otherwise(fmt)
    return df.withColumns(
        {
            "byte_size": F.octet_length(F.col(blob_col).cast("string")),
            "digest": F.md5(F.col(blob_col)),
            "format": fmt,
        }
    )


def _fake_decode(raw: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: the blob's md5 digest tiled to an
    h x w uint8 'pixel' grid. Chosen over an RNG because md5 exists in
    every SQL engine, so the ENTIRE decode -> pool -> embed pipeline is
    reproducible cross-engine and q95 can hash-check it against DuckDB
    — the strongest correctness statement a stub decoder can support."""
    digest = hashlib.md5(raw).digest()  # 16 bytes
    reps = -(-(h * w) // len(digest))
    return np.frombuffer(digest * reps, dtype=np.uint8)[: h * w].reshape(h, w)


def decode_and_embed(
    df: DataFrame, blob_col: str = "blob", decode: str = "fake", dim: int = 16
) -> DataFrame:
    """bytes -> decode -> resize/pool -> embedding, as one Arrow-batched
    mapInPandas pass. The decode seam is the single swap-in point for a
    real codec."""

    def _decode_batch(raw: bytes) -> np.ndarray:
        if decode == "fake":
            return _fake_decode(raw)
        raise NotImplementedError(
            "real media decode requires an image/audio codec (e.g. Pillow); "
            "swap it in here — the surrounding pipeline is codec-agnostic"
        )

    def pipe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            embs = []
            for raw in pdf[blob_col]:
                px = _decode_batch(bytes(raw)).astype(np.float32)
                # 'resize': mean-pool to a fixed grid, then flatten+truncate
                pooled = px.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
                emb = np.resize(pooled / 255.0, dim).astype(np.float32)
                embs.append(emb)
            yield pd.DataFrame(
                {"blob_id": pdf["blob_id"], "embedding": embs}
            )

    return df.mapInPandas(pipe, schema=f"blob_id long, embedding array<float>")


def sample_frames(df: DataFrame, n_frames: int = 4, blob_col: str = "blob") -> DataFrame:
    """Deterministic frame sampling for 'video' blobs: n byte-offsets
    spread over the blob, each sliced as a frame stub. Demonstrates the
    explode-shaped (blob -> frames) plumbing."""
    size = F.octet_length(F.col(blob_col).cast("string"))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i * size / n_frames).cast("int"),
    )
    return (
        df.select("blob_id", F.posexplode(offsets).alias("frame_idx", "offset"), blob_col)
        .withColumn("frame", F.expr(f"substring({blob_col}, offset + 1, 16)"))
        .select("blob_id", "frame_idx", "offset", "frame")
    )


_Q95_ORACLE = """
    WITH hx AS (
      SELECT doc_id, source AS origin, md5(text) AS h FROM documents
    ),
    bytes AS (  -- the 16 digest bytes, hex-decoded
      SELECT doc_id, origin,
             list_transform(range(16), j ->
               strpos('0123456789abcdef', substr(h, CAST(2*j+1 AS INTEGER), 1)) * 16
               + strpos('0123456789abcdef', substr(h, CAST(2*j+2 AS INTEGER), 1)) - 17
             ) AS b
      FROM hx
    ),
    pooled AS (  -- 8x8 digest-tiled pixels px[i][j] = b[(8i+j) % 16],
                 -- 2x2 mean-pool as INTEGER SUMS (pool k = row 2*(k//4), col 2*(k%4))
      SELECT doc_id, origin,
             list_transform(range(16), k ->
                 b[CAST((8*(2*(k//4))   + 2*(k%4))   % 16 + 1 AS INTEGER)]
               + b[CAST((8*(2*(k//4))   + 2*(k%4)+1) % 16 + 1 AS INTEGER)]
               + b[CAST((8*(2*(k//4)+1) + 2*(k%4))   % 16 + 1 AS INTEGER)]
               + b[CAST((8*(2*(k//4)+1) + 2*(k%4)+1) % 16 + 1 AS INTEGER)]
             ) AS p
      FROM bytes
    )
    SELECT origin, COUNT(*) AS n_blobs,
           CAST(SUM(p[1]) AS BIGINT) AS s0,
           CAST(SUM(p[2]) AS BIGINT) AS s1,
           CAST(SUM(p[3]) AS BIGINT) AS s2,
           CAST(SUM(p[4]) AS BIGINT) AS s3,
           CAST(SUM(list_aggregate(p, 'sum')) AS BIGINT) AS mass
    FROM pooled GROUP BY origin ORDER BY origin
"""


@register(
    "q95_blob_embed",
    oracle=_Q95_ORACLE,
    doc="Multimodal decode -> resize/pool -> embed pipeline, "
    "oracle-checked END-TO-END: the Arrow-batched mapInPandas kernel "
    "(decode_and_embed) produces the float embeddings; the query "
    "recovers each embedding component's exact integer pre-image "
    "(emb = pool_sum / (4*255), both divisions exact-invertible below "
    "1020) and aggregates integer checksums per origin, which DuckDB "
    "recomputes symbolically from md5(text). Any deviation anywhere in "
    "the batch plumbing — byte handling, pooling geometry, Arrow "
    "round-trip, float conversion — breaks the hash. The decode seam "
    "is the documented real-codec swap-in point; everything validated "
    "here is codec-independent.",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    blobs = blobs_from_documents(spark, sf)
    emb = decode_and_embed(blobs)
    as_int = F.transform(
        "embedding", lambda x: F.round(x * 1020).cast("long")
    )
    e = emb.join(blobs.select("blob_id", "origin"), "blob_id").select(
        "origin",
        as_int.alias("p"),
    )
    return (
        e.groupBy("origin")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum(F.element_at("p", 1)).cast("long").alias("s0"),
            F.sum(F.element_at("p", 2)).cast("long").alias("s1"),
            F.sum(F.element_at("p", 3)).cast("long").alias("s2"),
            F.sum(F.element_at("p", 4)).cast("long").alias("s3"),
            F.sum(
                F.aggregate("p", F.lit(0).cast("long"), lambda a, x: a + x)
            ).cast("long").alias("mass"),
        )
        .orderBy("origin")
    )


@register(
    "q96_frame_sample",
    oracle="""
        WITH blobs AS (
          SELECT doc_id AS blob_id, text, octet_length(CAST(text AS BLOB)) AS size
          FROM documents
        )
        SELECT blob_id, CAST(i AS BIGINT) AS frame_idx,
               CAST((i * size) // 4 AS INTEGER) AS "offset",
               substr(text, CAST((i * size) // 4 + 1 AS INTEGER), 16) AS frame
        FROM blobs, range(4) t(i)
        ORDER BY blob_id, frame_idx
    """,
    doc="Deterministic frame sampling over opaque blobs (the video -> "
    "frames explode shape): 4 byte offsets spread over each blob, each "
    "sliced as a 16-byte frame stub; full row-level oracle check of "
    "the offset arithmetic and binary slicing.",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    blobs = blobs_from_documents(spark, sf)
    return sample_frames(blobs, n_frames=4).select(
        "blob_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "offset",
        F.col("frame").cast("string").alias("frame"),
    ).orderBy("blob_id", "frame_idx")


@register(
    "q43_blob_metadata",
    oracle="""
        SELECT origin, COUNT(*) AS n_blobs,
               CAST(SUM(byte_size) AS BIGINT) AS total_bytes,
               COUNT(DISTINCT digest) AS n_unique
        FROM (SELECT source AS origin, octet_length(CAST(text AS BLOB)) AS byte_size,
                     md5(text) AS digest
              FROM documents) t
        GROUP BY origin ORDER BY origin
    """,
    doc="Multimodal blob metadata: size/digest/dedup stats per origin "
    "over an opaque BINARY column (decode-free path, fully "
    "oracle-checked).",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    blobs = attach_blob_metadata(blobs_from_documents(spark, sf))
    return (
        blobs.groupBy("origin")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("byte_size").cast("long").alias("total_bytes"),
            F.countDistinct("digest").alias("n_unique"),
        )
        .orderBy("origin")
    )
