"""Similarity search over the ``embeddings`` table (list<float> column).

- ``cosine_topk``: exact brute-force top-k — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once, fetched per actor in ``__init__``,
  never re-shipped per batch). The scale path: corpus streams, queries
  broadcast; per-batch partial top-k then a tiny global reduce.
- ``lsh_ann_topk``: the approximate scale path — random-hyperplane LSH buckets
  co-locate likely neighbors; only same-bucket candidates are scored.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..stages.actors import taskify

from .relational import read_table


def _stack(vecs) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _sig_to_bucket(sig: np.ndarray) -> np.ndarray:
    """(n, n_planes) 0/1 signature matrix -> int64 bucket ids.

    NOT ``np.packbits(...)[:, 0]``: packbits emits one byte per 8 bits, and
    keeping byte 0 silently truncates to the first 8 hyperplanes — any
    ``n_planes > 8`` (the knob for shrinking hot buckets) would be a no-op.
    A weighted fold keeps every plane; bit i keeps weight 2^i, so buckets
    for n_planes <= 8 are identical to the old little-endian packbits."""
    weights = 1 << np.arange(sig.shape[1], dtype=np.int64)
    return sig.astype(np.int64) @ weights


def _check_planes(n_planes: int) -> None:
    if not 1 <= n_planes <= 62:  # int64 bucket ids stay positive
        raise ValueError(f"n_planes must be in 1..62, got {n_planes}")


def _embedding_dim(emb: rd.Dataset) -> int | None:
    """Dimension of the embedding column, or None for an empty table."""
    rows = emb.take(1)
    return len(rows[0]["embedding"]) if rows else None


def _empty_ranked() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    )


def cosine_topk(
    sf_dir: str, *, n_queries: int = 5, k: int = 10, exclude_self: bool = True
) -> rd.Dataset:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Output (query_id, neighbor_id, rank), rank 1..k ordered by
    (cosine desc, neighbor_id asc) — integer-only output so the DuckDB
    ``list_cosine_similarity`` oracle matches without float-hash hazards.

    Per-batch partial top-k (k per query per batch) -> driver-side final merge
    of ``num_batches * k`` candidates: the full corpus never materializes.
    """
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    if qdf.empty:  # empty table / no query ids: the empty to_pandas() has
        return _empty_ranked()  # no columns and _stack([]) would raise
    qdf = qdf.sort_values("vec_id")
    q = _norm_rows(_stack(qdf["embedding"]))
    q_ids = qdf["vec_id"].to_numpy()
    ref = ray.put((q_ids, q))

    # stateless TASK stage with a per-worker cache cell (Ray deserializes
    # the closure once per worker, so the ray.get runs once per process) —
    # the broadcast-query pattern without actor-pool startup latency, which
    # dominated this stage's wall-time at small scale (cf. textfns.as_tasks)
    cache: list = []

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not cache:
            cache.append(ray.get(ref))
        q_ids, qm = cache[0]
        ids = batch["vec_id"].to_numpy()
        m = _norm_rows(_stack(batch["embedding"]))
        cos = qm @ m.T  # (Q, B)
        if exclude_self:
            cos[q_ids[:, None] == ids[None, :]] = -np.inf
        kk = min(k, cos.shape[1])
        # per-query partial top-k within this batch, selected by the SAME
        # total order as the final merge (cosine desc, neighbor_id asc) —
        # an argpartition on cosine alone breaks ties arbitrarily and can
        # drop the smaller-id neighbor the oracle keeps at the kth place.
        # Selection under one total order is associative, so partial-then-
        # final is exactly global top-k. Q is small (n_queries), B is one
        # batch: the per-query lexsort is O(Q * B log B) — noise next to
        # the matmul above.
        part = np.empty((len(q_ids), kk), dtype=np.int64)
        for qi in range(len(q_ids)):
            part[qi] = np.lexsort((ids, -cos[qi]))[:kk]
        rows = np.repeat(q_ids, kk)
        cols = part.ravel()
        return pd.DataFrame(
            {
                "query_id": rows,
                "neighbor_id": ids[cols],
                "cosine": cos[np.repeat(np.arange(len(q_ids)), kk), cols],
            }
        )

    partials = emb.map_batches(partial_topk, batch_format="pandas", batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["cosine"])]
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_ann_topk(
    sf_dir: str, *, n_queries: int = 5, k: int = 10, n_planes: int = 8, seed: int = 42
) -> rd.Dataset:
    """Approximate top-k: random-hyperplane signatures bucket the corpus; each
    query scores only its own bucket (plus Hamming-1 neighbors would raise
    recall — documented tradeoff). Output (query_id, neighbor_id, rank)."""
    _check_planes(n_planes)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = _embedding_dim(emb)
    if dim is None:
        return _empty_ranked()
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qdf = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    if qdf.empty:
        return _empty_ranked()
    qdf = qdf.sort_values("vec_id")
    qm = _norm_rows(_stack(qdf["embedding"]))
    q_sig = (qm @ planes.T > 0).astype(np.uint8)
    q_bucket = _sig_to_bucket(q_sig)
    ref = ray.put((qdf["vec_id"].to_numpy(), qm, q_bucket, planes))

    class BucketScore:
        def __init__(self):
            self.q_ids, self.q, self.q_bucket, self.planes = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy()
            m = _norm_rows(_stack(batch["embedding"]))
            sig = (m @ self.planes.T > 0).astype(np.uint8)
            bucket = _sig_to_bucket(sig)
            out = []
            for qi, (qid, qv, qb) in enumerate(
                zip(self.q_ids, self.q, self.q_bucket)
            ):
                mask = (bucket == qb) & (ids != qid)
                if not mask.any():
                    continue
                cos = m[mask] @ qv
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[mask], "cosine": cos}
                    )
                )
            if not out:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        "neighbor_id": pd.Series([], dtype="int64"),
                        "cosine": pd.Series([], dtype="float64"),
                    }
                )
            return pd.concat(out, ignore_index=True)

    partials = emb.map_batches(
        taskify(BucketScore), batch_format="pandas", batch_size=4096
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def lsh_near_dup_pairs(
    sf_dir: str,
    *,
    n_planes: int = 6,
    threshold: float = 0.35,
    seed: int = 42,
    chunk: int = 2048,
) -> rd.Dataset:
    """Embedding near-dup pairs, the SCALE path: random-hyperplane LSH
    buckets co-locate likely-similar vectors (2^n_planes buckets), and the
    all-pairs cosine compare runs only WITHIN each bucket — O(sum b_i^2)
    instead of O(N^2), no driver materialization, no broadcast matrix.
    Cross-bucket near-dups are the recall tradeoff (same as every LSH
    dedup). Output (vec_a, vec_b) with vec_a < vec_b.

    SKEW SAFETY: a dup-heavy corpus (exactly when you run dedup) produces a
    hot bucket; a naive per-bucket map_groups pins its entire O(b^2) compare
    on one task. Buckets larger than ``chunk`` members are therefore
    decomposed triangle-join style: members hash to ``C = ceil(b/chunk)``
    sub-chunks and every chunk PAIR (i <= j) becomes its own task, so the
    hot bucket fans out to C(C+1)/2 bounded tasks (each <= 2*chunk vectors,
    <= chunk^2 sims) at the cost of replicating each member C times — data
    shipped grows by C while compute per task drops by C^2. The emitted pair
    set is EXACTLY the within-bucket pair set (every unordered pair lands in
    exactly one chunk-pair task), so semantics are unchanged from the
    unchunked form.
    """
    _check_planes(n_planes)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = _embedding_dim(emb)
    if dim is None:  # empty table: the pass-1 histogram guard below would
        dim = 1  # never run (take(1) used to crash first); any dim works
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    ref = ray.put(planes)

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(ref)

        def _buckets(self, batch: pd.DataFrame) -> np.ndarray:
            m = _norm_rows(_stack(batch["embedding"]))
            sig = (m @ self.planes.T > 0).astype(np.uint8)
            return _sig_to_bucket(sig)

    class BucketOnly(Bucketize):
        """Pass 1: bucket histogram — no embeddings leave the read task."""

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"bucket": self._buckets(batch)})

    sizes = {
        int(r["bucket"]): int(r["count()"])
        for r in emb.map_batches(taskify(BucketOnly), batch_format="pandas")
        .groupby("bucket")
        .count()
        .take_all()  # tiny: <= 2^n_planes rows
    }
    if not sizes:
        return rd.from_items([]).map_batches(
            lambda t: pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                }
            ),
            batch_format="pandas",
        )
    n_chunks = {b: -(-c // chunk) for b, c in sizes.items()}
    enc = max(n_chunks.values()) + 1  # group-key radix
    chunks_ref = ray.put(n_chunks)

    class Route(Bucketize):
        """Pass 2: replicate each member to its C chunk-pair tasks,
        fully vectorized (repeat + cumsum arithmetic — no per-row loop).
        gkey = (bucket * enc + i) * enc + j for chunk pair (i <= j)."""

        def __init__(self):
            super().__init__()
            self.n_chunks = ray.get(chunks_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bucket = self._buckets(batch)
            ids = batch["vec_id"].to_numpy().astype(np.int64)
            C_arr = (
                pd.Series(bucket).map(self.n_chunks).fillna(1).to_numpy(np.int64)
            )
            c = ids % C_arr  # member's own chunk
            # expand each row C times; i_seq = 0..C-1 per row
            idx = np.repeat(np.arange(len(ids)), C_arr)
            starts = np.cumsum(C_arr) - C_arr
            i_seq = np.arange(int(C_arr.sum())) - np.repeat(starts, C_arr)
            c_rep = np.repeat(c, C_arr)
            lo = np.minimum(i_seq, c_rep)
            hi = np.maximum(i_seq, c_rep)
            gkey = (np.repeat(bucket, C_arr) * enc + lo) * enc + hi
            out = pd.DataFrame(
                {
                    "gkey": gkey.astype(np.int64),
                    "vec_id": ids[idx],
                }
            )
            out["embedding"] = batch["embedding"].to_numpy()[idx]
            return out

    def chunk_pair_fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
            }
        )
        if len(g) < 2:
            return empty
        gkey = int(g["gkey"].iloc[0])
        b, i, j = gkey // (enc * enc), (gkey // enc) % enc, gkey % enc
        C = n_chunks.get(b, 1)
        g = g.sort_values("vec_id", ignore_index=True)
        ids = g["vec_id"].to_numpy()
        m = _norm_rows(_stack(g["embedding"]))
        if i == j:  # within-chunk: upper triangle
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sims[ia, ib] >= threshold
            a, bb = ids[ia[keep]], ids[ib[keep]]
        else:  # cross-chunk: full bipartite compare, pair as (min, max)
            side = ids % C
            am, bm = side == i, side == j
            if not am.any() or not bm.any():
                return empty
            sims = m[am] @ m[bm].T
            ia, ib = np.nonzero(sims >= threshold)
            a_ids, b_ids = ids[am][ia], ids[bm][ib]
            a = np.minimum(a_ids, b_ids)
            bb = np.maximum(a_ids, b_ids)
        if len(a) == 0:
            return empty
        return pd.DataFrame(
            {"vec_a": a.astype("int64"), "vec_b": bb.astype("int64")}
        )

    return (
        emb.map_batches(taskify(Route), batch_format="pandas")
        .groupby("gkey")
        .map_groups(chunk_pair_fn, batch_format="pandas")
    )


def nearest_centroid(sf_dir: str, *, n_centroids: int = 8, seed: int = 7) -> rd.Dataset:
    """IVF-style coarse quantization: assign every vector to its nearest of
    ``n_centroids`` deterministic seed centroids (the corpus vectors with
    vec_id 0..n-1). Output (vec_id, centroid_id) — the partition map an IVF
    index would use."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cdf = emb.filter(expr=f"vec_id < {n_centroids}").to_pandas()
    if cdf.empty:  # no centroid ids present: _stack([]) would raise
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "centroid_id": pa.array([], pa.int64()),
                }
            )
        )
    cdf = cdf.sort_values("vec_id")
    cm = _norm_rows(_stack(cdf["embedding"]))
    ref = ray.put((cdf["vec_id"].to_numpy(), cm))

    class Assign:
        def __init__(self):
            self.c_ids, self.c = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = _norm_rows(_stack(batch["embedding"]))
            sim = m @ self.c.T
            best = sim.argmax(axis=1)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].astype("int64"),
                    "centroid_id": self.c_ids[best].astype("int64"),
                }
            )

    return emb.map_batches(
        taskify(Assign), batch_format="pandas", batch_size=4096
    )
