"""Deterministic synthetic change-event log (binlog/WAL-tail stand-in).

The reference has no CDC tail ("Streaming Data" is an unimplemented roadmap
item, ``/root/reference/README.md:782``); its change-apply semantics are a
duplicate-key overwrite upsert
(``/root/reference/internal/domain/aggregates/graph/graph_aggregate.go:46-59``)
plus a destructive full refresh (``/root/reference/cmd/main.go:173``). This
module synthesizes the changelog those semantics would consume: a seeded,
fully deterministic stream of I/U/D events over multi-turn transcripts, with
controllable key skew (Zipf over ``conv_id``), out-of-order timestamps (late
data), and mid-stream schema-evolution episodes.

Everything is vectorized numpy/pandas; generation of the sf0.1 bench fixture
(~2M events) takes a few seconds and is cached on disk under
``/tmp/graft_fixtures``. One Parquet file per epoch so that (a) epoch-range
reads prune at the file level and (b) evolution fixtures genuinely carry
different file schemas mid-stream.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

#: bump when generation logic or specs change — invalidates the disk cache
FIXTURE_VERSION = "v2"
FIXTURE_ROOT = "/tmp/graft_fixtures"

_EPOCH_BASE_US = 1_700_000_000_000_000  # fixed epoch base; no wall-clock anywhere

_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
_TOOLS = np.array(
    ["search", "python", "browser", "calculator", "sql", "editor"], dtype=object
)

_FILLER_SENTENCE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and pack my box with five dozen liquor jugs "
)


@dataclass(frozen=True)
class ChangelogSpec:
    """Deterministic generation parameters for one fixture."""

    n_events: int = 20_000
    n_convs: int = 1_000
    turns_per_conv: int = 40
    n_epochs: int = 8
    seed: int = 42
    p_update: float = 0.25
    p_delete: float = 0.05
    ooo_frac: float = 0.05  # fraction of events with an artificially old ts
    zipf_theta: float = 0.0  # 0 => uniform conv distribution; >1 => skewed
    evolution: str = "none"  # "none" | "addcol" | "widen"
    max_text_len: int = 400  # wide_text fixtures raise this

    def cache_key(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True)
        import hashlib

        return hashlib.sha1(payload.encode()).hexdigest()[:12]


def _filler_pool(rng: np.random.Generator, max_len: int, k: int = 256) -> np.ndarray:
    """K distinct deterministic filler strings with varied lengths."""
    base = _FILLER_SENTENCE * (max_len // len(_FILLER_SENTENCE) + 2)
    lengths = rng.integers(8, max(9, max_len), size=k)
    return np.array([base[i % 50 : i % 50 + int(L)] for i, L in enumerate(lengths)], dtype=object)


def generate(spec: ChangelogSpec) -> list[pa.Table]:
    """Generate the changelog as one Arrow table per epoch, fully seeded."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    lsn = np.arange(n, dtype=np.int64)
    per_epoch = max(1, -(-n // spec.n_epochs))  # ceil
    epoch = (lsn // per_epoch).astype(np.int32)

    # conv distribution: uniform or Zipf-skewed (hot keys)
    if spec.zipf_theta > 0:
        ranks = np.arange(1, spec.n_convs + 1, dtype=np.float64)
        probs = ranks ** (-spec.zipf_theta)
        probs /= probs.sum()
        conv_idx = rng.choice(spec.n_convs, size=n, p=probs)
    else:
        conv_idx = rng.integers(0, spec.n_convs, size=n)
    conv_id = pd.Series(conv_idx).map(lambda i: f"conv{i:08d}").to_numpy(dtype=object)

    turn_idx = rng.integers(0, spec.turns_per_conv, size=n).astype(np.int32)

    u = rng.random(n)
    op = np.full(n, "I", dtype=object)
    op[u < spec.p_update + spec.p_delete] = "U"
    op[u < spec.p_delete] = "D"

    # timestamps: monotone in lsn with jitter, plus out-of-order injections
    ts_us = _EPOCH_BASE_US + lsn * 1_000_000 + rng.integers(0, 1000, size=n)
    late_mask = rng.random(n) < spec.ooo_frac
    ts_us = ts_us - late_mask * rng.integers(1, 5_000, size=n) * 1_000_000

    role = _ROLES[rng.integers(0, len(_ROLES), size=n)]
    tool = np.where(
        role == "tool", _TOOLS[rng.integers(0, len(_TOOLS), size=n)], None
    )

    pool = _filler_pool(rng, spec.max_text_len)
    filler = pool[(conv_idx * 131 + turn_idx * 17 + lsn) % len(pool)]
    prefix = (
        "c=" + pd.Series(conv_id, dtype=object)
        + " t=" + pd.Series(turn_idx).astype(str)
        + " v=" + pd.Series(lsn).astype(str)
        + " | "
    )
    text = (prefix + pd.Series(filler, dtype=object)).to_numpy(dtype=object)

    # deletes carry only the key + ordering columns
    is_del = op == "D"
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    # One stable sort by epoch, then contiguous slices per epoch. Byte-
    # identical to masking each epoch (`x[epoch == e]`) — stable sort keeps
    # the original relative order within an epoch — but O(n log n) instead
    # of O(n_epochs * n): the mask loop made sf1 generation (20M events,
    # 320 epochs) take tens of minutes.
    order = np.argsort(epoch, kind="stable")
    lsn, op, conv_id = lsn[order], op[order], conv_id[order]
    turn_idx, role, text = turn_idx[order], role[order], text[order]
    tool, ts_us, is_del = tool[order], ts_us[order], is_del[order]
    epoch = epoch[order]
    n_out = int(epoch.max()) + 1
    bounds = np.searchsorted(epoch, np.arange(n_out + 1))

    tables: list[pa.Table] = []
    evolve_from = spec.n_epochs // 2
    for e in range(n_out):
        s = slice(int(bounds[e]), int(bounds[e + 1]))
        evolved = spec.evolution != "none" and e >= evolve_from
        turn_col: pa.Array
        if spec.evolution == "widen" and evolved:
            turn_col = pa.array(turn_idx[s].astype(np.int64), type=pa.int64())
        else:
            turn_col = pa.array(turn_idx[s], type=pa.int32())
        cols = {
            "lsn": pa.array(lsn[s], type=pa.int64()),
            "epoch": pa.array(epoch[s], type=pa.int32()),
            "op": pa.array(op[s], type=pa.string()),
            "conv_id": pa.array(conv_id[s], type=pa.string()),
            "turn_idx": turn_col,
            "role": pa.array(role[s], type=pa.string()),
            "text": pa.array(text[s], type=pa.string()),
            "tool": pa.array(tool[s], type=pa.string()),
            "ts": pa.array(ts_us[s], type=pa.timestamp("us")),
        }
        if spec.evolution == "addcol" and evolved:
            tv = np.where(
                is_del[s], None, np.char.add("v1.", epoch[s].astype(str)).astype(object)
            )
            cols["tool_version"] = pa.array(tv, type=pa.string())
        tables.append(pa.table(cols))
    return tables


# ---------------------------------------------------------------------------
# Disk cache
# ---------------------------------------------------------------------------


def fixture_dir(name: str, spec: ChangelogSpec) -> str:
    return os.path.join(FIXTURE_ROOT, FIXTURE_VERSION, f"{name}-{spec.cache_key()}")


def materialize(name: str, spec: ChangelogSpec) -> str:
    """Write the changelog to its cache dir (one file per epoch); idempotent.

    Returns the directory path. A ``_SUCCESS`` marker guards half-written
    caches (the writer stages to ``<dir>.tmp`` then renames).
    """
    out = fixture_dir(name, spec)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    for e, table in enumerate(generate(spec)):
        pq.write_table(table, os.path.join(tmp, f"epoch_{e:05d}.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        json.dump(asdict(spec), f)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    return out


def epoch_files(changelog_dir: str) -> list[tuple[int, str]]:
    """(epoch, path) pairs for a materialized changelog, sorted by EPOCH
    NUMBER — not filename: past the %05d padding (epoch 100000, ~28 h of a
    1-epoch/s tail) lexicographic order breaks, and the consumers
    (``_apply_inner``'s max_epochs slice + watermark, ``EpochWriter``
    resume numbering) all assume epoch order."""
    out = []
    for f in os.listdir(changelog_dir):
        if f.startswith("epoch_") and f.endswith(".parquet"):
            out.append(
                (
                    int(f[len("epoch_") : -len(".parquet")]),
                    os.path.join(changelog_dir, f),
                )
            )
    return sorted(out)


# ---------------------------------------------------------------------------
# Standard fixtures (FIXTURES.md §3), scaled by sf label
# ---------------------------------------------------------------------------

_SF_EVENTS = {"sf0.001": 20_000, "sf0.01": 200_000, "sf0.1": 2_000_000, "sf1": 20_000_000}


def spec_for(sf_label: str, variant: str = "basic") -> ChangelogSpec:
    if sf_label not in _SF_EVENTS:
        # a typo'd label must not silently benchmark 1/1000th of the
        # intended scale (the variant branch below raises the same way)
        raise ValueError(
            f"unknown sf label {sf_label!r}; known: {sorted(_SF_EVENTS)}"
        )
    n = _SF_EVENTS[sf_label]
    if variant == "scale":
        # larger replay used only by `bench.py --scaling`: enough events that
        # fixed overheads amortize, enough epoch files (~125k events each)
        # that the read stage can use every core at the 4N parallelism level
        # (a 10^10-event changelog ships as thousands of files, never 8)
        n *= 4
        return ChangelogSpec(
            n_events=n,
            n_convs=max(50, n // 20),
            n_epochs=max(32, n // 125_000),
            seed=42,
        )
    convs = max(50, n // 20)
    # one epoch file per ~62.5k events so read parallelism grows with scale
    base = dict(n_events=n, n_convs=convs, n_epochs=max(8, n // 62_500), seed=42)
    if variant == "basic":
        return ChangelogSpec(**base)
    if variant == "dup_heavy":
        return ChangelogSpec(**{**base, "n_convs": max(20, n // 200),
                                "p_update": 0.7, "ooo_frac": 0.2})
    if variant == "skew_hot":
        return ChangelogSpec(**{**base, "zipf_theta": 1.2})
    if variant == "evolve_addcol":
        return ChangelogSpec(**{**base, "evolution": "addcol"})
    if variant == "evolve_widen":
        return ChangelogSpec(**{**base, "evolution": "widen"})
    if variant == "wide_text":
        return ChangelogSpec(**{**base, "n_events": max(2_000, n // 10),
                                "max_text_len": 64_000})
    raise ValueError(f"unknown variant {variant!r}")


def fixture_for(sf_dir: str, variant: str = "basic") -> str:
    """Materialize (cached) the changelog fixture matching a testdata sf dir.

    ``sf_dir`` is e.g. ``/root/testdata/sf0.01``; only its basename is used as
    the scale label so the fixture path is a pure function of (sf, variant) —
    the oracle SQL embeds the same path via this function.
    """
    label = os.path.basename(os.path.normpath(sf_dir))
    return materialize(f"{label}-{variant}", spec_for(label, variant))
