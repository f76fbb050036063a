"""Deduplication operators over the ``documents`` table.

- exact dedup: content hash -> hash-partition groupby -> keep min doc_id
- char-set Jaccard pairs: exact all-pairs similarity on a deterministic
  subsample (oracle-checkable against DuckDB's ``jaccard()``)
- MinHash + LSH banding: shingle -> minhash signature -> band buckets ->
  candidate pairs -> exact-Jaccard verification (probabilistic recall)
- SimHash: 64-bit token-weight simhash, banded for near-dup buckets

Shuffle thinking at 100 TB: every variant pre-reduces inside ``map_batches``
(signatures/hashes are tiny vs text) and shuffles only (key, doc_id) pairs,
never document bodies. MinHash candidate verification is shuffle-native:
pair dedup via a pair-hash groupby and text lookup via one hash join —
nothing unbounded ever reaches the driver. ``connected_components`` turns
verified pairs into dedup clusters with join-free label propagation.
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..stages.actors import taskify
from ray.data.aggregate import Count

from .relational import arrow_out, read_table


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big", signed=True)


# ---------------------------------------------------------------------------
# Exact dedup (hash-partition + per-group first)
# ---------------------------------------------------------------------------


def _coarse_parts(est_row_bytes: int, *, floor: int = 256) -> int:
    """Coarse-partition modulus sized to the DATA: one group holds at most
    ~64 MB of shuffled rows, with a floor so tiny inputs keep enough groups
    for parallelism. Unlike join fan-in (``relational.sized_partitions``)
    there is NO cpu clamp: extra groups just queue, while too-few groups put
    an unbounded slice of the corpus in ONE map_groups task — at 10^11 docs a
    fixed ``% 256`` means ~0.4B rows (~15 GB) per task."""
    return int(max(floor, est_row_bytes // (64 << 20)))


def exact_dedup_groups(sf_dir: str) -> rd.Dataset:
    """One row per distinct text: (doc_id = min id, n_copies). Grouping is by
    128-bit content hash so the shuffle moves 16-byte keys, not documents."""

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # ~56 B per shuffled row (doc_id + hex hash + part key); count() is
    # Parquet metadata, no data read. Per-group bound: ~64 MB of hash rows.
    n_parts = _coarse_parts(ds.count() * 56)

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        hashes = b["text"].fillna("").map(
            lambda s: hashlib.md5(s.encode()).hexdigest()
        )
        out = pd.DataFrame({"doc_id": b["doc_id"], "text_hash": hashes})
        # coarse partition: the exchange moves n_parts groups; the per-hash
        # fine groupby happens in cython INSIDE each group (one Python
        # dispatch per distinct text would dominate on a dedup-heavy corpus)
        h = pd.util.hash_array(hashes.to_numpy(dtype=object))
        out["_part"] = (h % n_parts).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("text_hash", sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return out[["doc_id", "n_copies"]].astype(
            {"doc_id": "int64", "n_copies": "int64"}
        )

    return (
        ds.map_batches(arrow_out(add_hash), batch_format="pandas")
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Char-set Jaccard pairs (exact; oracle = DuckDB jaccard())
# ---------------------------------------------------------------------------


def jaccard_char_pairs(
    sf_dir: str, *, modulus: int = 7, threshold: float = 0.6
) -> rd.Dataset:
    """All (a < b) doc pairs with character-set Jaccard >= threshold, over the
    deterministic subsample doc_id % modulus == 0.

    This is the exact-all-pairs DEMO operator (oracle-checkable against
    DuckDB's ``jaccard()``); the scale path for unbounded corpora is the
    MinHash/LSH and SimHash family below. Its cost model is still kept
    scale-sane: char sets are packed to 16-byte ASCII BITMASKS distributed
    (inside ``map_batches``, vectorized via view-as-uint8 one-hot), only
    (doc_id, mask) rows — 24 B/doc — reach the driver for broadcast, and a
    guard refuses subsamples past ~2M docs where the O(n²/P) compare stops
    being the right tool. Document TEXTS never leave the workers."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pa.array(t.column("doc_id").to_numpy(zero_copy_only=False) % modulus == 0)
        ),
        batch_format="pyarrow",
    )

    def to_masks(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized ASCII one-hot: bytes of each text index into a (n, 128)
        # presence matrix; non-ASCII folds to bit 127 (rare in the corpus,
        # exact for the oracle's ASCII fixtures)
        texts = b["text"].fillna("").tolist()
        n = len(texts)
        mat = np.zeros((n, 128), dtype=bool)
        for i, s in enumerate(texts):  # bounded: O(len) byte view per doc
            bs = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
            mat[i, np.minimum(bs, 127)] = True
        packed = np.packbits(mat, axis=1)  # (n, 16) uint8
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy()})
        out["mask"] = list(packed)
        return out

    import ray

    sets_df = docs.map_batches(to_masks, batch_format="pandas").to_pandas()
    if len(sets_df) == 0:
        # empty subsample: the empty to_pandas() has no columns, and
        # np.stack on zero masks would raise — short-circuit typed-empty
        return rd.from_arrow(
            pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        )
    if len(sets_df) >= 2_000_000:  # a raise, not an assert: python -O
        raise ValueError(
            "jaccard_char_pairs is the bounded exact-pairs demo; use the "
            "MinHash/LSH path for corpora of this size"
        )
    sets_df = sets_df.sort_values("doc_id").reset_index(drop=True)
    mat = np.unpackbits(np.stack(sets_df["mask"].to_numpy()), axis=1).astype(bool)
    ref = ray.put((sets_df["doc_id"].to_numpy(), mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.sizes = self.mat.sum(axis=1)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            rows = batch["doc_id"].to_numpy()
            pos = np.searchsorted(self.ids, rows)
            sub = self.mat[pos]  # (b, A)
            inter = sub.astype(np.int32) @ self.mat.T.astype(np.int32)  # (b, N)
            union = self.sizes[pos][:, None] + self.sizes[None, :] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            a_ids = np.repeat(rows, len(self.ids)).reshape(len(rows), -1)
            b_ids = np.broadcast_to(self.ids, a_ids.shape)
            keep = (jac >= threshold) & (a_ids < b_ids)
            return pa.table(
                {
                    "doc_a": pa.array(a_ids[keep], pa.int64()),
                    "doc_b": pa.array(b_ids[keep], pa.int64()),
                }
            )

    return (
        docs.select_columns(["doc_id"])
        .map_batches(taskify(PairFinder), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_WORD = re.compile(r"[A-Za-z0-9_]+")


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


# above this many (deduped) candidate pairs the shingle dict stops being a
# broadcastable small side and verification falls back to the shuffle join
_BROADCAST_PAIR_CAP = 2_000_000

# ...and the pair count alone does not bound driver memory: the broadcast
# path materializes every candidate doc's shingle-hash array on the driver,
# so it is ALSO gated on an estimated byte budget (candidate-doc count x
# avg doc bytes x 1.6 — a shingle-hash array is ~8 B per token, ~1.6x the
# text bytes). Past this, verification falls back to the shuffle join.
_BROADCAST_BYTES_CAP = 1 << 30

# below this many pairs the verify kernel runs on the driver over the
# already-fetched shingle dict (one vectorized pass) instead of spinning a
# third Ray execution; 100k pairs * ~2 * 200 shingles * 8 B ~ 320 MB peak
_DRIVER_VERIFY_CAP = 100_000

# below this many band rows (bands x docs; 24 B each so the cap is ~50 MB)
# candidate generation pulls the (doc_id, band, band_hash) triples to the
# driver and pair-mines them in one pandas groupby — the distributed
# alternative is a Ray sort-shuffle whose fixed cost (~2 s) dwarfs moving a
# few MB. Above the cap the coarse-partition groupby is the scale path.
_DRIVER_BAND_CAP = 2_000_000

# below this estimated in-memory corpus size the candidate texts are read
# driver-side with one column-pruned parquet read instead of a second full
# Ray execution over the corpus (each Ray exec carries ~1 s fixed cost that
# dwarfs a few-MB read); above it, the distributed shingle stage is the
# scale path
_DRIVER_TEXT_CAP = 256 << 20


def _shingle_hashes(text: str) -> np.ndarray:
    """Sorted unique uint64 hashes of a doc's shingle set — the exact-Jaccard
    currency both verification paths trade in."""
    sh = list(_shingles(text or ""))
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.sort(pd.util.hash_array(np.array(sh, dtype=object)))


def _pair_jaccard_keep(
    a_arrs: list, b_arrs: list, threshold: float
) -> np.ndarray:
    """Vectorized exact Jaccard over many (a, b) shingle-hash-set pairs in ONE
    sort-merge pass: concatenate every pair's two sorted-unique arrays labeled
    by pair index, lexsort, and count adjacent equal values within a pair —
    each duplicate is exactly one intersection element. Returns a keep mask."""
    n = len(a_arrs)
    if n == 0:
        return np.empty(0, dtype=bool)
    lens = np.empty(2 * n, dtype=np.int64)
    lens[0::2] = [len(x) for x in a_arrs]
    lens[1::2] = [len(x) for x in b_arrs]
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, dtype=bool)
    vals = np.empty(total, dtype=np.uint64)
    pos = 0
    for i in range(n):
        for arr in (a_arrs[i], b_arrs[i]):
            vals[pos : pos + len(arr)] = arr
            pos += len(arr)
    pid = np.repeat(np.arange(2 * n, dtype=np.int64) // 2, lens)
    order = np.lexsort((vals, pid))
    v, p = vals[order], pid[order]
    dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    union = lens[0::2] + lens[1::2] - inter
    return (union > 0) & (inter / np.maximum(union, 1) >= threshold)


@functools.lru_cache(maxsize=8)
def _minhasher_cached(num_perm: int) -> "MinHasher":
    """One MinHasher per (worker process, num_perm): lets the band-row stage
    run as stateless TASKS (no actor-pool warmup — measured dominant at small
    scale) while still building the permutation matrix once per process."""
    return MinHasher(num_perm=num_perm)


class MinHasher:
    """Per-batch minhash signatures: shingle -> 31-bit hashes -> per-permutation
    min via the (a*x+b) mod p trick, all in native uint64 vector math.

    p = 2^31 - 1 keeps a*x + b < 2^62, so the whole permutation matrix is
    exact uint64 arithmetic — no Python-object bigints (the naive 61-bit
    prime forces dtype=object and is ~100x slower). Shingle hashing uses
    pandas' vectorized siphash, not per-shingle md5 calls."""

    P31 = np.uint64((1 << 31) - 1)

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(self.P31), size=num_perm).astype(np.uint64)
        self.b = rng.integers(0, int(self.P31), size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, vectorized ACROSS documents:
        all shingles of the batch flatten into ONE hash_array call and the
        per-document minima come from a single segmented ``minimum.reduceat``
        — no per-document permutation loop (min over a set is order-free, so
        this is bit-identical to hashing each document alone)."""
        sh_lists = [list(_shingles(t or "")) for t in texts]
        lens = np.array([len(s) for s in sh_lists], dtype=np.int64)
        n = len(sh_lists)
        out = np.full((n, self.num_perm), int(self.P31), dtype=np.uint64)
        if lens.sum() == 0:
            return out
        flat = np.concatenate(
            [np.array(s, dtype=object) for s in sh_lists if s]
        )
        # hash_key must be EXACTLY 16 bytes (pandas siphash contract)
        base = pd.util.hash_array(flat, hash_key="graft_minhash_31") & self.P31
        nonempty = lens > 0
        seg = lens[nonempty]
        starts = np.concatenate(([0], np.cumsum(seg)[:-1]))
        # per-permutation flat pass: one (a*x+b) % p over ALL shingles plus a
        # segmented min — O(P*S) with O(S) memory. Coefficients go through
        # Python int deliberately: numpy's binop with an INDEXED uint64
        # scalar takes a ~60x slower cast path than with a plain int
        # (measured on this numpy), and the uint64 wraparound semantics are
        # identical either way.
        p31 = int(self.P31)
        mins = np.empty((len(seg), self.num_perm), dtype=np.uint64)
        for i in range(self.num_perm):
            row = (base * int(self.a[i]) + int(self.b[i])) % p31
            mins[:, i] = np.minimum.reduceat(row, starts)
        out[nonempty] = mins
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch["text"].fillna("").tolist())
        out = pd.DataFrame({"doc_id": batch["doc_id"]})
        out["sig"] = list(sigs)
        return out


def _bucket_pairs_coarse(g: pd.DataFrame) -> pd.DataFrame:
    """Pair-mine every (band, band_hash) bucket of a coarse group. ONLY safe
    when no bucket exceeds the skew cap — callers check first and route hot
    buckets through ``_mine_candidates_skew_safe`` chunk-pair fan-out."""
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for _, sub in g.groupby(["band", "band_hash"], sort=False):
        if len(sub) < 2:
            continue
        ids = np.unique(sub["doc_id"].to_numpy())
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        outs_a.append(ids[ia])
        outs_b.append(ids[ib])
    if not outs_a:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return pd.DataFrame(
        {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
    )


def _max_bucket_size(band_pd: pd.DataFrame) -> int:
    """Largest (band, band_hash) bucket in a driver-side band-row frame."""
    if not len(band_pd):
        return 0
    return int(
        band_pd.groupby(["band", "band_hash"], sort=False)["doc_id"].size().max()
    )


def _mine_candidates_skew_safe(
    bands_ds: rd.Dataset, *, bucket_cap: int
) -> rd.Dataset:
    """Candidate pairs from band rows with a HARD per-task pair bound.

    One coarse groupby mines every bucket with <= ``bucket_cap`` members
    in place; a hot bucket (b > cap members — a dup-heavy corpus, exactly
    when you run MinHash) is NOT mined in its own task (that is O(b^2)
    pairs in one task: 10^5 shared-band docs -> 10^10 pairs). Instead its
    members are re-emitted as ROUTING rows replicated to chunk-PAIR tasks,
    triangle-join style (same decomposition as
    ``similarity.lsh_near_dup_pairs``): members hash to C = ceil(b/cap)
    chunks via doc_id % C and every chunk pair (lo <= hi) becomes one task
    of <= 2*cap members and <= cap^2 pairs. Every unordered in-bucket pair
    (x, y) lands in EXACTLY the task (min(cx,cy), max(cx,cy)) — the emitted
    pair set is provably identical to the unchunked form, so the regime
    split is a pure scheduling change (pinned by the parity tests).

    Routing rows ride the SAME output schema as pairs (doc_b = -1 marks a
    routing row; ``bh`` carries the band_hash and ``meta`` packs
    (band, lo, hi, C) into 16-bit fields), so the whole mine is one
    map_groups plus one small groupby over hot-bucket rows only — cold
    buckets (the overwhelming majority) pay nothing.
    """
    empty4 = {
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "bh": pd.Series([], dtype="int64"),
        "meta": pd.Series([], dtype="int64"),
    }

    def mine_or_route(g: pd.DataFrame) -> pd.DataFrame:
        pa_out: list[np.ndarray] = []
        pb_out: list[np.ndarray] = []
        route_frames: list[pd.DataFrame] = []
        for (band, band_hash), sub in g.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(sub["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) <= bucket_cap:
                ia, ib = np.triu_indices(len(ids), k=1)
                pa_out.append(ids[ia])
                pb_out.append(ids[ib])
                continue
            # hot bucket: fan into C(C+1)/2 chunk-pair tasks. C is capped
            # at 2^16-1 so (band, lo, hi, C) packs into one int64; for a
            # monster bucket the effective chunk grows past bucket_cap
            # rather than overflowing the key (documented tradeoff).
            C = min(-(-len(ids) // bucket_cap), (1 << 16) - 1)
            c = ids % C
            idx = np.repeat(np.arange(len(ids)), C)
            i_seq = np.tile(np.arange(C, dtype=np.int64), len(ids))
            c_rep = np.repeat(c, C)
            lo = np.minimum(i_seq, c_rep)
            hi = np.maximum(i_seq, c_rep)
            meta = (int(band) << 48) | (lo << 32) | (hi << 16) | C
            route_frames.append(
                pd.DataFrame(
                    {
                        "doc_a": ids[idx],
                        "doc_b": np.int64(-1),
                        "bh": np.int64(band_hash),
                        "meta": meta.astype(np.int64),
                    }
                )
            )
        frames = []
        if pa_out:
            a = np.concatenate(pa_out)
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": a,
                        "doc_b": np.concatenate(pb_out),
                        "bh": np.zeros(len(a), dtype=np.int64),
                        "meta": np.zeros(len(a), dtype=np.int64),
                    }
                )
            )
        frames.extend(route_frames)
        if not frames:
            return pd.DataFrame(empty4)
        return pd.concat(frames, ignore_index=True).astype("int64")

    def chunk_mine(g: pd.DataFrame) -> pd.DataFrame:
        meta = int(g["meta"].iloc[0])
        C = meta & 0xFFFF
        hi = (meta >> 16) & 0xFFFF
        lo = (meta >> 32) & 0xFFFF
        ids = np.unique(g["doc_a"].to_numpy())
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")}
        )
        side = ids % C
        if lo == hi:  # within-chunk: upper triangle
            sub = ids[side == lo]
            if len(sub) < 2:
                return empty
            ia, ib = np.triu_indices(len(sub), k=1)
            return pd.DataFrame({"doc_a": sub[ia], "doc_b": sub[ib]})
        am, bm = ids[side == lo], ids[side == hi]
        if not len(am) or not len(bm):
            return empty
        a2 = np.repeat(am, len(bm))
        b2 = np.tile(bm, len(am))
        return pd.DataFrame(
            {"doc_a": np.minimum(a2, b2), "doc_b": np.maximum(a2, b2)}
        )

    mined = (
        bands_ds.groupby("_part")
        .map_groups(arrow_out(mine_or_route), batch_format="pandas")
        .materialize()
    )
    cold = mined.filter(expr="doc_b >= 0").select_columns(["doc_a", "doc_b"])
    hot = mined.filter(expr="doc_b < 0").materialize()
    if hot.count() == 0:
        return cold
    hot_pairs = (
        hot.groupby(["bh", "meta"])
        .map_groups(chunk_mine, batch_format="pandas")
        .select_columns(["doc_a", "doc_b"])
    )
    return cold.union(hot_pairs)


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    bucket_cap: int = 2048,
) -> rd.Dataset:
    """Near-dup candidate pairs via LSH banding, verified with exact shingle
    Jaccard. Output: (doc_a, doc_b) verified pairs.

    Dataflow: map_batches(signatures) -> explode to (band, band_hash, doc_id)
    -> groupby band bucket -> per-bucket pairs -> dedup pairs -> verify.
    Only signatures and ids shuffle; texts are re-joined only for candidates.
    Buckets past ``bucket_cap`` members fan out chunk-pair style
    (``_mine_candidates_skew_safe``) so no task ever holds O(b^2) pairs.
    """
    rows = num_perm // bands
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()  # Parquet metadata, no data read
    # band rows are ~24 B (doc_id, band, band_hash) triples; size the coarse
    # modulus so one map_groups task holds <= ~64 MB of them
    n_parts = _coarse_parts(n_docs * bands * 24)

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        """Stateless task stage (the per-process ``_minhasher_cached`` gives
        actor-style one-time setup without actor-pool warmup); per-batch work
        is vectorized across documents."""
        mh = _minhasher_cached(num_perm)
        sigs = mh.signatures(batch["text"].fillna("").tolist())  # (n, P)
        n = len(batch)
        # per-band rolling hash over the band's signature columns,
        # vectorized across all docs at once (uint64 wraparound is the
        # mixing); emitted as ints so the shuffle moves 8-byte keys
        mult = np.uint64(0x9E3779B97F4A7C15)
        bh = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows):
                h = h * mult + sigs[:, b * rows + c]
            bh[:, b] = h
        flat = bh.reshape(-1).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "band_hash": flat,
                # coarse partition key: the Ray exchange moves n_parts
                # data-sized groups, the exact (band, band_hash) split
                # happens vectorized in pandas INSIDE each group —
                # per-group Python dispatch on ~1 group per doc-band
                # would dominate otherwise
                "_part": (flat % n_parts).astype(np.int64),
            }
        )

    bucket_pairs_coarse = _bucket_pairs_coarse

    # Candidate generation has two regimes, switched on the band-row count
    # (bands x docs, known from Parquet metadata before any read):
    #
    # * driver (band rows <= _DRIVER_BAND_CAP): band rows are 24-byte
    #   triples, so even a 100k-doc corpus yields only a few MB — pair-mine
    #   them on the driver with the SAME kernel the distributed path runs
    #   per partition. The alternative is a Ray sort-shuffle whose fixed
    #   barrier cost (~2 s) exceeds the entire phase at this scale.
    #   Driver mining still respects the skew cap: if any bucket exceeds
    #   bucket_cap members (O(b^2) pairs would blow the driver exactly
    #   like a worker), the band rows fall through to the distributed
    #   chunk-pair path.
    # * groupby (above the cap): coarse-partition hash shuffle, pair mining
    #   inside each partition with hot buckets fanned into chunk-pair tasks
    #   — nothing driver-side grows with the corpus.
    candidates = None

    if n_docs * bands <= _DRIVER_BAND_CAP and (
        docs.size_bytes() or 0
    ) <= _DRIVER_TEXT_CAP:
        # FULL-driver regime: the whole corpus fits comfortably in driver
        # memory, so the pipeline is one column-pruned parquet read plus
        # the SAME vectorized kernels the distributed stages run
        # (band_rows / bucket_pairs_coarse / _pair_jaccard_keep) — zero
        # Ray executions. Each Ray exec carries ~1 s fixed cost; at this
        # scale that is 4-8x the actual compute (signatures for 5k docs:
        # 0.5 s single-threaded). The distributed regimes below are the
        # scale path and are exercised by the regime-parity tests with
        # forced caps.
        import os as _os

        import pyarrow.parquet as _pq

        t = _pq.read_table(
            _os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        did = t.column("doc_id").to_numpy().astype(np.int64)
        texts = [x or "" for x in t.column("text").to_pylist()]
        band_pd = band_rows(pd.DataFrame({"doc_id": did, "text": texts}))
        if _max_bucket_size(band_pd) <= bucket_cap:
            pairs = (
                bucket_pairs_coarse(band_pd)
                .drop_duplicates(["doc_a", "doc_b"])
                .reset_index(drop=True)
            )
            if not len(pairs):
                return rd.from_arrow(
                    pa.table(
                        {
                            "doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64()),
                        }
                    )
                )
            text_by_id = dict(zip(did.tolist(), texts))
            a = pairs["doc_a"].to_numpy(np.int64)
            b = pairs["doc_b"].to_numpy(np.int64)
            sh = {
                int(x): _shingle_hashes(text_by_id.get(int(x), ""))
                for x in np.unique(np.concatenate([a, b]))
            }
            keep = _pair_jaccard_keep(
                [sh[int(x)] for x in a],
                [sh[int(x)] for x in b],
                jaccard_threshold,
            )
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array(a[keep], pa.int64()),
                        "doc_b": pa.array(b[keep], pa.int64()),
                    }
                )
            )
        # skew detected: hand the already-computed band rows to the
        # chunk-pair path; verification regimes below proceed as usual
        candidates = _mine_candidates_skew_safe(
            rd.from_arrow(pa.Table.from_pandas(band_pd, preserve_index=False)),
            bucket_cap=bucket_cap,
        )

    if candidates is None and n_docs * bands <= _DRIVER_BAND_CAP:
        band_pd = docs.map_batches(band_rows, batch_format="pandas").to_pandas()
        if _max_bucket_size(band_pd) <= bucket_cap:
            candidates = rd.from_arrow(
                pa.Table.from_pandas(
                    bucket_pairs_coarse(band_pd)[["doc_a", "doc_b"]],
                    preserve_index=False,
                )
            )
        else:
            candidates = _mine_candidates_skew_safe(
                rd.from_arrow(
                    pa.Table.from_pandas(band_pd, preserve_index=False)
                ),
                bucket_cap=bucket_cap,
            )
    elif candidates is None:
        candidates = _mine_candidates_skew_safe(
            docs.map_batches(arrow_out(band_rows), batch_format="pandas"),
            bucket_cap=bucket_cap,
        )

    # Verification has two regimes, switched on the DEDUPED candidate count
    # (ids only — 16 bytes/pair — so counting them is cheap at any scale):
    #
    # * broadcast (pairs <= _BROADCAST_PAIR_CAP): candidate doc ids are
    #   broadcast once (ray.put), one map_batches over the corpus shingles
    #   only candidate docs, the resulting {doc_id: sorted-hash-array} dict
    #   (orders of magnitude smaller than the corpus) is broadcast back, and
    #   verification is a plain map_batches over the pair list — NO join, NO
    #   pair exchange. This is the common case: even a dup-heavy corpus
    #   yields candidate pairs ~ O(dup clusters), not O(corpus).
    #
    # * shuffle-join (above the cap): each pair splits into two half-rows,
    #   ONE hash join (fan-in sized to corpus bytes, never a fixed constant)
    #   pulls the half's text in, a post-join map shingles each doc once per
    #   partition, and a coarse groupby on hash(pair) co-locates both halves,
    #   dedups cross-band duplicates and verifies in one vectorized pass.
    #   Ray's join operator carries a per-partition actor-pool startup cost
    #   (~6.5 s floor observed even at num_partitions=2 on this host), which
    #   is exactly why the broadcast path exists for the small-candidate case.
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    p_pair = max(64, 4 * cpus)  # pair-exchange groups

    # the distributed miners emit one copy of a pair PER MATCHING BAND (up
    # to bands-fold duplicates); dedup the 16-byte id-pairs BEFORE the
    # regime gate so (a) n_pairs really is the deduped count the gate
    # documents (an inflated count could misroute a broadcastable corpus
    # onto the expensive shuffle-join path) and (b) the join/verify stages
    # downstream never pay for duplicate pairs. Local drop_duplicates per
    # batch first (kills same-partition copies for free), then one coarse
    # hash-partition exchange of the survivors.
    def _local_dd(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(["doc_a", "doc_b"])
        h = pd.util.hash_pandas_object(
            b[["doc_a", "doc_b"]], index=False
        ).to_numpy()
        return b.assign(_pp=(h % p_pair).astype("int64"))

    def _group_dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]

    candidates = (
        candidates.map_batches(arrow_out(_local_dd), batch_format="pandas")
        .groupby("_pp")
        .map_groups(arrow_out(_group_dd), batch_format="pandas")
    )
    candidates = candidates.materialize()  # ids only — tiny relative to corpus
    n_pairs = candidates.count()

    empty_pairs = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if n_pairs == 0:
        return rd.from_arrow(empty_pairs)

    corpus_bytes = docs.size_bytes() or 0
    # byte gate for the broadcast path (see _BROADCAST_BYTES_CAP): bound
    # candidate docs by min(2 pairs-worth, corpus) and estimate the shingle
    # dict at avg-doc-bytes x 1.6 per candidate
    est_dict_bytes = (
        min(2 * n_pairs, n_docs) * (corpus_bytes / max(n_docs, 1)) * 1.6
    )

    if n_pairs <= _BROADCAST_PAIR_CAP and est_dict_bytes <= _BROADCAST_BYTES_CAP:
        pairs = (
            candidates.to_pandas()
            .drop_duplicates(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        cand_ids = np.unique(
            np.concatenate(
                [pairs["doc_a"].to_numpy(np.int64), pairs["doc_b"].to_numpy(np.int64)]
            )
        )
        if corpus_bytes <= _DRIVER_TEXT_CAP:
            # small corpus: ONE driver-side column-pruned parquet read for
            # the candidate texts — a second full Ray execution's fixed
            # cost (~1 s) dwarfs moving a few MB
            import os as _os

            import pyarrow.parquet as _pq

            t = _pq.read_table(
                _os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"],
            )
            did = t.column("doc_id").to_numpy().astype(np.int64)
            pos = np.searchsorted(cand_ids, did)
            pos[pos >= len(cand_ids)] = 0
            mask = cand_ids[pos] == did
            idx = np.flatnonzero(mask)
            texts = t.column("text").take(pa.array(idx)).to_pylist()
            sh = {
                int(d): _shingle_hashes(tx or "")
                for d, tx in zip(did[idx], texts)
            }
        else:
            ids_ref = _ray.put(cand_ids)  # sorted — filter via searchsorted

            def shingle_candidates(b: pd.DataFrame) -> pd.DataFrame:
                """Stateless task stage (no actor-pool warmup — the pool
                startup was measurably the dominant cost of this phase at
                small scale): the candidate-id array is a zero-copy plasma
                fetch per task."""
                ids = _ray.get(ids_ref)
                did = b["doc_id"].to_numpy(np.int64)
                pos = np.searchsorted(ids, did)
                pos[pos >= len(ids)] = 0
                mask = ids[pos] == did
                kept = b.loc[mask]
                return pd.DataFrame(
                    {
                        "doc_id": kept["doc_id"].to_numpy(np.int64),
                        "sh": [_shingle_hashes(t) for t in kept["text"]],
                    }
                )

            sh_rows = docs.map_batches(
                shingle_candidates, batch_format="pandas"
            ).take_all()
            sh = {int(r["doc_id"]): r["sh"] for r in sh_rows}
        e = np.empty(0, dtype=np.uint64)

        if len(pairs) <= _DRIVER_VERIFY_CAP:
            # the shingle dict is already on the driver (take_all above) and
            # the verify kernel is one vectorized sort-merge pass — a third
            # Ray execution + actor pool would cost more than it saves
            a = pairs["doc_a"].to_numpy(np.int64)
            b = pairs["doc_b"].to_numpy(np.int64)
            keep = _pair_jaccard_keep(
                [sh.get(int(x), e) for x in a],
                [sh.get(int(x), e) for x in b],
                jaccard_threshold,
            )
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_a": pa.array(a[keep], pa.int64()),
                        "doc_b": pa.array(b[keep], pa.int64()),
                    }
                )
            )

        sh_ref = _ray.put(sh)

        def make_verifier():
            # taskify: the shingle dict is fetched + deserialized from
            # plasma ONCE per worker process, not once per batch
            shd = _ray.get(sh_ref)

            def verify_broadcast(t: pa.Table) -> pa.Table:
                a = t.column("doc_a").to_numpy()
                b = t.column("doc_b").to_numpy()
                keep = _pair_jaccard_keep(
                    [shd.get(int(x), e) for x in a],
                    [shd.get(int(x), e) for x in b],
                    jaccard_threshold,
                )
                return pa.table(
                    {
                        "doc_a": pa.array(a[keep], pa.int64()),
                        "doc_b": pa.array(b[keep], pa.int64()),
                    }
                )

            return verify_broadcast

        make_verifier.__name__ = "verify_broadcast"
        pairs_ds = rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
        return pairs_ds.map_batches(taskify(make_verifier), batch_format="pyarrow")

    # --- shuffle-join path: candidate set too large to broadcast ---
    num_partitions = int(np.clip(corpus_bytes // (64 << 20), 2, 4 * cpus))

    halves = candidates.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [
                        t.column("doc_a").combine_chunks().cast(pa.int64()),
                        t.column("doc_b").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "doc_a": pa.concat_arrays(
                    [t.column("doc_a").combine_chunks().cast(pa.int64())] * 2
                ),
                "doc_b": pa.concat_arrays(
                    [t.column("doc_b").combine_chunks().cast(pa.int64())] * 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    texts = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").combine_chunks().cast(pa.int64()),
                "text": t.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = halves.join(
        texts, join_type="inner", num_partitions=num_partitions, on=("doc_id",)
    )

    def attach_shingles(b: pd.DataFrame) -> pa.Table:
        """Shingle each candidate doc ONCE per partition block (the join
        co-locates a doc's half-rows), emit per-half rows carrying the
        sorted shingle-hash array as an Arrow large_list<uint64> column —
        texts never enter the pair exchange."""
        if b.empty:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "sh": pa.array([], pa.large_list(pa.uint64())),
                    "_ppart": pa.array([], pa.int32()),
                }
            )
        sh_map: dict[int, np.ndarray] = {}
        for did, txt in zip(b["doc_id"], b["text"]):
            if did not in sh_map:
                sh_map[did] = _shingle_hashes(txt)
        arrs = [sh_map[d] for d in b["doc_id"]]
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
        offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        values = (
            np.concatenate(arrs) if offsets[-1] else np.empty(0, dtype=np.uint64)
        )
        sh_col = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(values, pa.uint64())
        )
        a = b["doc_a"].to_numpy()
        bb = b["doc_b"].to_numpy()
        ph = pd.util.hash_array(a) * np.uint64(0x9E3779B97F4A7C15) ^ pd.util.hash_array(bb)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(bb, pa.int64()),
                "side": pa.array((b["doc_id"].to_numpy() == bb).astype(np.int8)),
                "sh": sh_col,
                "_ppart": pa.array((ph % p_pair).astype(np.int32)),
            }
        )

    with_sh = joined.map_batches(
        attach_shingles, batch_format="pandas", batch_size=None
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """All pairs of the group in one pass: concatenate both sides'
        shingle hashes labeled by pair index, lexsort, count adjacent equal
        values within a pair (hashes are unique per doc, so every duplicate
        is one intersection element)."""
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
            }
        )
        g = g.drop_duplicates(["doc_a", "doc_b", "side"]).sort_values(
            ["doc_a", "doc_b", "side"], kind="mergesort", ignore_index=True
        )
        if len(g) == 0:
            return empty
        assert len(g) % 2 == 0
        arrs = g["sh"].tolist()  # ndarray cells (Arrow list -> pandas)
        keep = _pair_jaccard_keep(arrs[0::2], arrs[1::2], jaccard_threshold)
        a_ids = g["doc_a"].to_numpy()[0::2]
        b_ids = g["doc_b"].to_numpy()[0::2]
        return pd.DataFrame(
            {
                "doc_a": a_ids[keep].astype("int64"),
                "doc_b": b_ids[keep].astype("int64"),
            }
        )

    return with_sh.groupby("_ppart").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit simhash over token siphash-derived 64-bit hashes, vectorized
    ACROSS documents: all tokens of the batch hash in one ``hash_array``
    call, the per-bit ±1 votes sum per document with one segmented
    ``add.reduceat`` over the (tokens, 64) bit matrix — no per-document
    permutation/shift work."""

    def __init__(self):
        self.word = _WORD
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhashes(self, texts) -> np.ndarray:
        tok_lists = [self.word.findall((t or "").lower()) for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        out = np.zeros(len(tok_lists), dtype=np.int64)
        if lens.sum() == 0:
            return out
        flat = np.concatenate(
            [np.array(t, dtype=object) for t in tok_lists if t]
        )
        hs = pd.util.hash_array(flat, hash_key="graft_simhash_64")
        # bit k of the uint64 == unpackbits(little) position k on the
        # little-endian byte view — pure C, no broadcast-shift (numpy's
        # uint64 broadcast shift takes a ~60x slower cast path)
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)  # (S, 64)
        votes = 2 * bits - 1
        nonempty = lens > 0
        seg = lens[nonempty]
        starts = np.concatenate(([0], np.cumsum(seg)[:-1]))
        sums = np.add.reduceat(votes, starts, axis=0)  # (n_nonempty, 64)
        packed = np.packbits((sums > 0), axis=1, bitorder="little")  # (n, 8)
        out[nonempty] = packed.view(np.int64).ravel()
        return out

    def simhash(self, text: str) -> int:
        return int(self.simhashes([text])[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": self.simhashes(batch["text"].fillna("").tolist()),
            }
        )


def simhash_buckets(sf_dir: str, *, band_bits: int = 16) -> rd.Dataset:
    """Docs sharing any 16-bit simhash band -> near-dup buckets:
    (band, band_value, n_docs) COUNT rows for buckets with >= 2 docs
    (bucket membership stays distributed; use the bucket key to fetch
    members when needed)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = docs.map_batches(taskify(SimHasher), batch_format="pandas")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = b["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for band in range(64 // band_bits):
            val = (h >> np.uint64(band * band_bits)) & np.uint64((1 << band_bits) - 1)
            parts.append(
                pd.DataFrame(
                    {"doc_id": b["doc_id"], "band": band, "band_value": val.astype("int64")}
                )
            )
        return pd.concat(parts, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")
    counts = exploded.groupby(["band", "band_value"]).aggregate(
        Count(alias_name="n_docs")
    )
    return counts.filter(expr="n_docs >= 2")


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------


def connected_components(
    pairs: rd.Dataset,
    *,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 25,
    num_parts: int | None = None,
) -> rd.Dataset:
    """Distributed connected components over a pair Dataset by min-label
    propagation: every node starts labeled with itself; each round pushes the
    smaller label across every edge, until a fixpoint. Convergence is
    detected by the label SUM (labels only ever decrease), a one-number
    aggregate — no driver-side graph. Rounds needed = component diameter,
    which for near-dup clusters is small by construction.

    Each round is two coarse exchanges and no join operator: edge endpoints
    and label rows co-locate on ``hash(node) % num_parts`` and the label
    lookup happens as a vectorized pandas merge INSIDE each partition (the
    repo's standard coarse-partition pattern), then a Min-groupby folds the
    proposals. Output: (doc_id, component_id = min doc_id of the component).

    The reference has no graph algorithms at all (its "graph" is a
    write-only export); this is the dedup-cluster step a 100 TB corpus
    pipeline runs between pair mining and canonical-document selection.
    """
    from ray.data.aggregate import Min

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column(col_a).combine_chunks().cast(pa.int64())
        b = t.column(col_b).combine_chunks().cast(pa.int64())
        # both directions: (key, other); label rows use other = -1 sentinel
        return pa.table(
            {
                "key": pa.concat_arrays([a, b]),
                "other": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if num_parts is None:
        # one propagate task holds <= ~64 MB of (edge + label) messages;
        # materialized edge bytes are exact, labels add at most one row per
        # node (bounded by edge endpoints), hence the 2x
        num_parts = _coarse_parts(2 * (edges.size_bytes() or 0), floor=64)

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("key"), "cand": t.column("key")})

    labels = (
        edges.map_batches(to_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("cand", alias_name="label"))
        .materialize()
    )
    if labels.count() == 0:  # empty pair set: Dataset.sum returns None below
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "component_id": pa.array([], pa.int64()),
                }
            )
        )

    def part_of(col: pa.ChunkedArray) -> pa.Array:
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        return pa.array((h % num_parts).astype(np.int32))

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column("key"),
                "other": t.column("other"),
                "lab": pa.nulls(t.num_rows, pa.int64()),
                "_part": part_of(t.column("key").combine_chunks()),
            }
        )

    edge_msgs = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        labs = g[g["other"] == -1][["key", "lab"]]
        ed = g[g["other"] != -1][["key", "other"]]
        merged = ed.merge(labs, on="key", how="inner")
        return pd.concat(
            [
                labs.rename(columns={"key": "node", "lab": "cand"}),
                merged[["other", "lab"]].rename(
                    columns={"other": "node", "lab": "cand"}
                ),
            ],
            ignore_index=True,
        ).astype({"node": "int64", "cand": "int64"})

    prev = int(labels.sum("label"))
    converged = False
    for _ in range(max_iters):

        def label_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "key": t.column("node"),
                    "other": pa.array(np.full(n, -1, dtype=np.int64)),
                    "lab": t.column("label"),
                    "_part": part_of(t.column("node").combine_chunks()),
                }
            )

        lab_msgs = labels.map_batches(label_rows, batch_format="pyarrow")
        labels = (
            lab_msgs.union(edge_msgs)
            .groupby("_part")
            .map_groups(propagate, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        cur = int(labels.sum("label"))
        if cur == prev:  # labels only decrease; equal sum == fixpoint
            converged = True
            break
        prev = cur
    if not converged:
        # returning the unconverged labels would silently split one
        # component into several — wrong answers beat no answers never
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(a component's diameter exceeds max_iters under min-label "
            "propagation) — rerun with a larger max_iters"
        )

    return labels.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("node").cast(pa.int64()),
                "component_id": t.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
