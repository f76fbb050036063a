"""Single-process oracles for the queries the driver can only rows-check
(no SQL expression exists): langid, fingerprints, simhash buckets, minhash
pairs, LSH ANN, multimodal features. Each test recomputes the expected
result with an independent straight-line implementation and compares
exactly, so these operators are value-checked too, not just row-counted."""

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(
        zip(t.column("doc_id").to_pylist(),
            [x or "" for x in t.column("text").to_pylist()])
    )


def test_text_langid_counts_oracle(ray_session, docs):
    from sql_graph_visualizer_ray.functions.textfns import LANG_STOPWORDS
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = (
        build_queries()["text_langid_counts"](SF)
        .to_pandas()
        .set_index("pred_lang")["n_docs"]
        .to_dict()
    )

    want: dict[str, int] = {}
    langs = sorted(LANG_STOPWORDS)
    for _, text in docs:
        scores = []
        for lang in langs:
            pat = r"\b(" + "|".join(sorted(LANG_STOPWORDS[lang])) + r")\b"
            scores.append(len(re.findall(pat, text, re.IGNORECASE)))
        top = max(scores)
        pred = "und"
        if top > 0 and scores.count(top) == 1:
            pred = langs[scores.index(top)]
        want[pred] = want.get(pred, 0) + 1
    assert got == want


def test_text_fingerprints_oracle(ray_session, docs):
    from sql_graph_visualizer_ray.functions.textfns import TOKEN_PATTERN
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = (
        build_queries()["text_fingerprints"](SF)
        .to_pandas()
        .set_index("doc_id")["fingerprint"]
        .to_dict()
    )
    pat = re.compile(TOKEN_PATTERN)
    mod = (1 << 61) - 1
    for doc_id, text in docs:
        h = 0
        for tok in pat.findall(text):
            h = (h * 1000003 + zlib.crc32(tok.encode("utf-8", "ignore"))) % mod
        assert got[doc_id] == h, doc_id


def test_dedup_simhash_buckets_oracle(ray_session, docs):
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = (
        build_queries()["dedup_simhash_buckets"](SF)
        .to_pandas()
        .set_index(["band", "band_value"])["n_docs"]
        .to_dict()
    )
    # independent straight-line simhash: per-token siphash, sign-sum bits
    word = re.compile(r"[A-Za-z0-9_]+")
    counts: dict[tuple[int, int], int] = {}
    for _, text in docs:
        toks = word.findall(text.lower())
        if not toks:
            sh = 0
        else:
            hs = pd.util.hash_array(
                np.array(toks, dtype=object), hash_key="graft_simhash_64"
            )
            v = np.zeros(64, dtype=np.int64)
            for h in hs:
                for bit in range(64):
                    v[bit] += 1 if (int(h) >> bit) & 1 else -1
            sh = 0
            for bit in range(64):
                if v[bit] > 0:
                    sh |= 1 << bit
        for band in range(4):
            val = (sh >> (band * 16)) & 0xFFFF
            # cast through int64 as the engine emits
            counts[(band, val)] = counts.get((band, val), 0) + 1
    want = {k: v for k, v in counts.items() if v >= 2}
    assert got == want


def test_dedup_minhash_pairs_oracle(ray_session, docs):
    """Straight-line LSH: per-doc signatures (single-doc code path), banding
    loop, bucket pairs, STRING-set shingle Jaccard verify — independent of
    the distributed exchange AND of the hashed-set verify optimization."""
    from sql_graph_visualizer_ray.pipelines.dedup import MinHasher, _shingles
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = set(
        map(
            tuple,
            build_queries()["dedup_minhash_pairs"](SF)
            .to_pandas()[["doc_a", "doc_b"]]
            .itertuples(index=False),
        )
    )

    mh = MinHasher(num_perm=64)
    bands, rows = 16, 4
    buckets: dict[tuple[int, tuple], set[int]] = {}
    texts = dict(docs)
    for doc_id, text in docs:
        sig = mh.signature(text)
        for b in range(bands):
            key = (b, tuple(sig[b * rows : (b + 1) * rows].tolist()))
            buckets.setdefault(key, set()).add(doc_id)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    want = set()
    for a, b in cands:
        sa, sb = _shingles(texts[a]), _shingles(texts[b])
        u = len(sa | sb)
        if u and len(sa & sb) / u >= 0.5:
            want.add((a, b))
    assert got == want


def test_embed_lsh_topk_oracle(ray_session):
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = (
        build_queries()["embed_lsh_topk"](SF)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, m.shape[1]))
    sig = (m @ planes.T > 0).astype(np.uint8)
    bucket = np.packbits(sig, axis=1, bitorder="little")[:, 0].astype(np.int64)
    rows = []
    for qpos in np.flatnonzero(ids < 5):
        qid, qb, qv = ids[qpos], bucket[qpos], m[qpos]
        mask = (bucket == qb) & (ids != qid)
        cand = np.flatnonzero(mask)
        cos = m[cand] @ qv
        order = sorted(zip(-cos, ids[cand]))[:10]
        for r, (negc, nid) in enumerate(order, start=1):
            rows.append((int(qid), int(nid), r))
    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_multimodal_features_oracle(ray_session, docs):
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = build_queries()["multimodal_features"](SF).to_pandas().set_index("doc_id")
    for doc_id, text in docs[:100]:
        payload = text.encode()
        digest = hashlib.md5(payload).digest()
        row = got.loc[doc_id]
        assert row["n_bytes"] == len(payload)
        assert row["checksum"] == digest.hex()
        feat = np.asarray(row["feature"], dtype=np.float32)
        want = (np.frombuffer(digest, dtype=np.uint8)[:8] / 255.0).astype(np.float32)
        assert np.array_equal(feat, want)


def test_connected_components_matches_union_find(ray_session):
    """Distributed min-label propagation == single-process union-find over
    the same pair set (plus a hand-built chain graph that needs multiple
    propagation rounds)."""
    import pyarrow as pa

    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.dedup import connected_components

    # chain 1-2-3-4-5, triangle 10-11-12, isolated edge 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = (
        connected_components(pairs)
        .to_pandas()
        .set_index("doc_id")["component_id"]
        .to_dict()
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want
    assert got[5] == 1 and got[12] == 10 and got[21] == 20

    # empty pair set -> empty labeling (Dataset.sum yields None on empty)
    empty = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    )
    out_ds = connected_components(empty)
    assert out_ds.count() == 0
    assert out_ds.schema().names == ["doc_id", "component_id"]


def test_minhash_components_consistent_with_pairs(ray_session):
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    qs = build_queries()
    pairs = qs["dedup_minhash_pairs"](SF).to_pandas()
    comp = (
        qs["dedup_minhash_components"](SF)
        .to_pandas()
        .set_index("doc_id")["component_id"]
        .to_dict()
    )
    # every paired doc is labeled, endpoints of a pair share a component,
    # and each component's id is its minimum member
    for a, b in pairs.itertuples(index=False):
        assert comp[a] == comp[b]
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    for c, ms in members.items():
        assert c == min(ms)


def test_hll_distinct_users_within_tolerance(ray_session):
    """The HLL sketch estimate per event_type stays within ~5% of the exact
    distinct count (p=12 gives ~1.6% typical error), and a pure-numpy
    single-process HLL over the same inputs reproduces the distributed
    estimate exactly (merge-of-partials == one-shot registers)."""
    import pyarrow.parquet as _pq

    from sql_graph_visualizer_ray.functions.sketches import HyperLogLog
    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = (
        build_queries()["events_distinct_users_hll"](SF)
        .to_pandas()
        .set_index("event_type")["n_users_approx"]
        .to_dict()
    )
    t = _pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    df = t.to_pandas()
    hll = HyperLogLog(p=12)
    for etype, sub in df.groupby("event_type"):
        exact = sub["user_id"].nunique()
        approx = got[etype]
        assert abs(approx - exact) <= max(2, 0.05 * exact), (etype, exact, approx)
        # one-shot registers over all values == merged per-batch registers
        oneshot = hll.estimate(hll.registers(sub["user_id"].to_numpy()))
        assert oneshot == approx, etype


def test_embed_lsh_near_dup_pairs_oracle(ray_session):
    """Distributed LSH-bucketed near-dup pairs == single-process recompute
    (same planes/seed), and every emitted pair truly clears the cosine
    threshold."""
    import pyarrow.parquet as _pq

    from sql_graph_visualizer_ray.pipelines.queries import build_queries

    got = set(
        map(
            tuple,
            build_queries()["dedup_embed_lsh_pairs"](SF)
            .to_pandas()[["vec_a", "vec_b"]]
            .itertuples(index=False),
        )
    )

    t = _pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
    )
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((6, m.shape[1]))
    bucket = np.packbits((m @ planes.T > 0).astype(np.uint8), axis=1,
                         bitorder="little")[:, 0]
    want = set()
    for b in np.unique(bucket):
        pos = np.flatnonzero(bucket == b)
        order = np.argsort(ids[pos])
        pos = pos[order]
        sims = m[pos] @ m[pos].T
        ia, ib = np.triu_indices(len(pos), k=1)
        for i, j in zip(ia[sims[ia, ib] >= 0.35], ib[sims[ia, ib] >= 0.35]):
            want.add((int(ids[pos[i]]), int(ids[pos[j]])))
    assert got == want
    assert len(got) > 0


def test_retired_bounded_demos_against_duckdb(ray_session):
    """jaccard_char_pairs and dedup_embed_cosine left the driver registry
    (the 50-entry correctness cap goes to the shuffle-native operators; these
    are the documented bounded exact-pairs demos) but remain library
    functions — value-check them here against DuckDB directly."""
    import duckdb

    from sql_graph_visualizer_ray.pipelines import dedup
    from sql_graph_visualizer_ray.pipelines.queries import dedup_embed_cosine

    con = duckdb.connect()
    got = (
        dedup.jaccard_char_pairs(SF)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    want = (
        con.sql(
            "WITH d AS (SELECT doc_id, coalesce(text,'') AS t "
            f"FROM read_parquet('{SF}/documents.parquet')) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM d a JOIN d b "
            "ON a.doc_id % 7 = 0 AND b.doc_id % 7 = 0 AND a.doc_id < b.doc_id "
            "WHERE jaccard(a.t, b.t) >= 0.6"
        )
        .df()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    got2 = (
        dedup_embed_cosine(SF)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"], ignore_index=True)
    )
    want2 = (
        con.sql(
            "WITH s AS (SELECT vec_id, embedding "
            f"FROM read_parquet('{SF}/embeddings.parquet') WHERE vec_id % 5 = 0) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM s a JOIN s b "
            "ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35"
        )
        .df()
        .sort_values(["vec_a", "vec_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got2[want2.columns], want2, check_dtype=False)


def test_lsh_near_dup_pairs_hot_bucket_chunked(ray_session, tmp_path):
    """Adversarial skew: a dup-heavy corpus collapses into one LSH bucket.
    With a small chunk cap the bucket decomposes into many bounded chunk-pair
    tasks; the emitted pair set must EQUAL the unchunked within-bucket
    brute force (the decomposition is exact, not an approximation)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from sql_graph_visualizer_ray.pipelines.similarity import lsh_near_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    n = 240
    # near-identical vectors -> identical hyperplane signature (hot bucket)
    vecs = base[None, :] + 1e-3 * rng.standard_normal((n, 16))
    # plus background noise vectors spread over other buckets
    noise = rng.standard_normal((120, 16))
    allv = np.vstack([vecs, noise]).astype(np.float32)
    ids = np.arange(len(allv), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([list(map(float, v)) for v in allv],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(allv), dtype=np.int32)),
        }
    )
    d = tmp_path / "hot"
    d.mkdir()
    _pq.write_table(t, d / "embeddings.parquet")

    got = set(
        map(
            tuple,
            lsh_near_dup_pairs(str(d), chunk=32)
            .to_pandas()[["vec_a", "vec_b"]]
            .itertuples(index=False),
        )
    )

    # independent recompute: same planes, per-bucket brute force
    m = allv.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    planes = np.random.default_rng(42).standard_normal((6, 16))
    bucket = np.packbits((m @ planes.T > 0).astype(np.uint8), axis=1,
                         bitorder="little")[:, 0]
    want = set()
    for b in np.unique(bucket):
        pos = np.flatnonzero(bucket == b)
        sims = m[pos] @ m[pos].T
        ia, ib = np.triu_indices(len(pos), k=1)
        for x, y in zip(ia[sims[ia, ib] >= 0.35], ib[sims[ia, ib] >= 0.35]):
            want.add((int(ids[pos][x]), int(ids[pos][y])))
    assert (bucket == bucket[0]).sum() >= n  # the hot bucket really is hot
    assert got == want
    assert len(got) >= n * (n - 1) // 2  # the hot bucket's pairs all survive


def test_minhash_regime_parity(ray_session):
    """Every minhash_lsh_pairs regime must produce the SAME pair set: the
    full-driver fast path (default at test scale), the distributed band
    groupby + broadcast verify (forced by zeroing the driver caps), and
    the shuffle-join verify (forced by also zeroing the broadcast cap).
    This is what licenses the regime switches as pure optimizations."""
    import sql_graph_visualizer_ray.pipelines.dedup as dd

    def run():
        return (
            dd.minhash_lsh_pairs(SF)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    base = run()
    saved = (dd._DRIVER_BAND_CAP, dd._DRIVER_TEXT_CAP, dd._DRIVER_VERIFY_CAP,
             dd._BROADCAST_PAIR_CAP)
    try:
        # middle regime: driver band mining kept, distributed shingle exec
        # + driver verify forced
        dd._DRIVER_TEXT_CAP = 0
        assert run().equals(base), "driver-band/dist-shingle regime diverged"
        # distributed candidates + broadcast-exec shingles + Ray verify exec
        dd._DRIVER_BAND_CAP = 0
        dd._DRIVER_VERIFY_CAP = 0
        assert run().equals(base), "groupby/broadcast regime diverged"
        # shuffle-join verify (the 100 TB path)
        dd._BROADCAST_PAIR_CAP = 0
        assert run().equals(base), "shuffle-join regime diverged"
    finally:
        (dd._DRIVER_BAND_CAP, dd._DRIVER_TEXT_CAP, dd._DRIVER_VERIFY_CAP,
         dd._BROADCAST_PAIR_CAP) = saved
    assert len(base) > 0


def test_minhash_hot_bucket_chunked(ray_session, tmp_path):
    """Adversarial skew for MinHash banding: one text shared by hundreds of
    docs puts them ALL in one (band, band_hash) bucket per band. With a small
    bucket_cap the bucket must fan into bounded chunk-pair tasks, and the
    emitted (verified) pair set must EQUAL the unchunked mining — in the
    driver-detected regime AND the fully distributed regime."""
    import pyarrow as pa

    import sql_graph_visualizer_ray.pipelines.dedup as dd

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(400)]
    n_hot, n_cold = 200, 60
    texts = ["the quick brown fox jumps over the lazy dog again and again"] * n_hot
    texts += [
        " ".join(rng.choice(words, size=12).tolist()) for _ in range(n_cold)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_hot + n_cold), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    def run(**kw):
        out = dd.minhash_lsh_pairs(str(tmp_path), **kw).to_pandas()
        return set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))

    base = run(bucket_cap=10**9)  # unchunked driver mining
    assert len(base) >= n_hot * (n_hot - 1) // 2  # the clique survives verify

    # driver regime detects the hot bucket and falls to the chunk-pair path
    assert run(bucket_cap=32) == base

    saved = dd._DRIVER_BAND_CAP
    try:
        dd._DRIVER_BAND_CAP = 0  # force fully distributed mining
        assert run(bucket_cap=32) == base
    finally:
        dd._DRIVER_BAND_CAP = saved


def test_jaccard_char_pairs_empty_subsample(ray_session, tmp_path):
    """A modulus matching no doc_id returns an empty typed pair set instead
    of crashing on np.stack of zero masks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_graph_visualizer_ray.pipelines import dedup

    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array(["aa", "bb", "cc"], pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = dedup.jaccard_char_pairs(str(tmp_path), modulus=5)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_a", "doc_b"}


def test_connected_components_nonconvergence_raises(ray_session):
    """Unconverged labels would silently split one component in two — the
    loop must raise when a component's diameter exceeds max_iters, and the
    same graph must solve with enough rounds."""
    import pyarrow as pa

    import pytest
    import ray.data as rd

    from sql_graph_visualizer_ray.pipelines.dedup import connected_components

    edges = [(i, i + 1) for i in range(12)]  # a diameter-12 chain
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iters=2)
    got = connected_components(pairs, max_iters=25).to_pandas()
    assert (got["component_id"] == 0).all() and len(got) == 13


def test_events_null_group_and_sql_rounding(ray_session, tmp_path):
    """Two latent oracle divergences pinned on a synthetic events table the
    sf fixtures don't cover: a NULL event_type must survive GROUP BY
    (SQL keeps the NULL group), and value_cents must round half AWAY FROM
    ZERO (SQL round()), not banker's (np.round)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sql_graph_visualizer_ray.pipelines.events import (
        distinct_users_per_type,
        user_activity_summary,
    )

    n = 10
    t = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(
                ["click", None, "click", None, "view"] * 2, pa.string()
            ),
            "ts": pa.array(list(range(n)), pa.timestamp("us")),
            # 0.125 is exactly representable: *100 = 12.5 cents — banker's
            # rounds to 12, SQL round() says 13
            "value": pa.array([0.125] * n, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS FROM read_parquet('{tmp_path}/events.parquet')"
    )

    got = (
        distinct_users_per_type(str(tmp_path))
        .to_pandas()
        .sort_values("event_type", na_position="first", ignore_index=True)
    )
    want = con.sql(
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"
    ).df()
    assert len(got) == 3  # click, view, NULL — the NULL group survives
    assert got["n_users"].tolist() == want["n_users"].tolist()
    assert got["event_type"].fillna("~").tolist() == want[
        "event_type"
    ].fillna("~").tolist()

    got2 = user_activity_summary(str(tmp_path), min_events=5).to_pandas()
    want2 = con.sql(
        "SELECT user_id, COUNT(*) AS n_events, "
        "CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents "
        "FROM events GROUP BY user_id HAVING COUNT(*) >= 5"
    ).df()
    assert got2["value_cents"].tolist() == want2["value_cents"].tolist() == [130]
