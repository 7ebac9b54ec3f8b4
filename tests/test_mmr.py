"""q355_mmr_rerank is rows-only (greedy argmax is not SQL-expressible);
its substitute gate: the full output — selection order, relevance, MMR
scores — must equal an independent NumPy replica of centroid-query
cosine + lambda-weighted greedy MMR, at two scale factors."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from harmony_spark.extensions.similarity import _MMR_K, _MMR_LAMBDA, _MMR_POOL
from harmony_spark.registry import load_all


def _numpy_mmr(sf: str):
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pydict()
    ids = t["vec_id"]
    E = np.asarray([list(v) for v in t["embedding"]], dtype=np.float32).astype(
        np.float64
    )
    q = np.asarray(
        [
            np.mean([float(v[i]) for v in t["embedding"]])
            for i in range(E.shape[1])
        ]
    )
    rel_all = (E @ q) / (np.linalg.norm(E, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-rel_all[i], ids[i]))
    order = order[:_MMR_POOL]
    V = {ids[i]: E[i] for i in order}
    rel = {ids[i]: float(rel_all[i]) for i in order}
    norm = {k: v / np.linalg.norm(v) for k, v in V.items()}
    selected, out = [], []
    remaining = sorted(V, key=lambda k: (-rel[k], k))
    for rank in range(1, _MMR_K + 1):
        best, best_score = None, None
        for k in remaining:
            red = max((float(norm[k] @ norm[s]) for s in selected), default=0.0)
            score = _MMR_LAMBDA * rel[k] - (1 - _MMR_LAMBDA) * red
            if best_score is None or score > best_score or (
                score == best_score and k < best
            ):
                best, best_score = k, score
        selected.append(best)
        remaining.remove(best)
        out.append((rank, best, round(rel[best], 6), round(best_score, 6)))
    return out


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_mmr_matches_numpy_replica(spark, sf):
    got = [tuple(r) for r in load_all()["q355_mmr_rerank"].fn(spark, sf).collect()]
    assert got == _numpy_mmr(sf)
