"""Similarity-operator edge cases pinned by the round-5 review: LSH bucket
ids must use ALL hyperplanes (packbits[:, 0] silently truncated past 8),
partial top-k must tie-break like the oracle (cosine desc, id asc), and
empty inputs return typed empties instead of crashing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sql_graph_visualizer_ray.pipelines.similarity import (
    _sig_to_bucket,
    cosine_topk,
    lsh_ann_topk,
    lsh_near_dup_pairs,
    nearest_centroid,
)


def test_sig_to_bucket_uses_all_planes():
    # 12 planes, only the high bit set: the old packbits[:, 0] fold
    # truncated this to bucket 0
    sig = np.zeros((3, 12), dtype=np.uint8)
    sig[0, 11] = 1
    sig[1, 3] = 1
    sig[2, [0, 11]] = 1
    got = _sig_to_bucket(sig)
    assert got.tolist() == [2048, 8, 2049]
    # <= 8 planes: identical to little-endian packbits (back-compat)
    sig8 = (np.arange(24).reshape(3, 8) % 3 == 0).astype(np.uint8)
    want8 = np.packbits(sig8, axis=1, bitorder="little")[:, 0].astype(np.int64)
    assert np.array_equal(_sig_to_bucket(sig8), want8)


def _write_embeddings(tmp_path, vecs: dict[int, list[float]]):
    ids = sorted(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in ids], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))


def test_cosine_topk_tie_break_matches_oracle_order(ray_session, tmp_path):
    """30 identical vectors tie at cosine 1.0; the partial top-k must keep
    the SMALLEST neighbor ids (the oracle's ORDER BY cosine DESC, vec_id
    ASC), not an arbitrary argpartition subset."""
    vecs = {i: [1.0, 0.0] for i in range(30)}
    vecs.update({100 + i: [0.0, 1.0] for i in range(5)})  # orthogonal chaff
    _write_embeddings(tmp_path, vecs)
    got = (
        cosine_topk(str(tmp_path), n_queries=1, k=10)
        .to_pandas()
        .sort_values("rank")
    )
    # query 0 excluded (exclude_self): expected neighbors 1..10 in id order
    assert got["neighbor_id"].tolist() == list(range(1, 11))
    assert got["rank"].tolist() == list(range(1, 11))


def test_similarity_empty_table_guards(ray_session, tmp_path):
    _write_embeddings(tmp_path, {})
    assert cosine_topk(str(tmp_path)).count() == 0
    assert lsh_ann_topk(str(tmp_path)).count() == 0
    assert lsh_near_dup_pairs(str(tmp_path)).count() == 0
    assert nearest_centroid(str(tmp_path)).count() == 0


def test_lsh_n_planes_beyond_8_effective(ray_session, tmp_path):
    """n_planes=16 must run (old code truncated to 8) and still find the
    exact-duplicate pair that shares every band."""
    rng = np.random.default_rng(5)
    vecs = {i: rng.standard_normal(8).tolist() for i in range(40)}
    vecs[41] = vecs[7]  # exact duplicate of vec 7 -> same 16-plane bucket
    _write_embeddings(tmp_path, vecs)
    pairs = lsh_near_dup_pairs(
        str(tmp_path), n_planes=16, threshold=0.99
    ).to_pandas()
    assert (7, 41) in set(zip(pairs["vec_a"], pairs["vec_b"]))
    with pytest.raises(ValueError, match="n_planes"):
        lsh_near_dup_pairs(str(tmp_path), n_planes=63)
