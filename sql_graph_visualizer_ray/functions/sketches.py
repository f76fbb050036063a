"""Mergeable sketches for approximate distinct counting (HyperLogLog).

At 100 TB an exact ``COUNT(DISTINCT user_id)`` shuffles every (key, user)
pair; the HLL form shuffles one ``m``-byte register blob per (group, batch) —
constant-size partials that merge by elementwise max, the canonical
pre-aggregation shape (Flajolet et al. 2007; the same standard-public
algorithm every warehouse exposes as ``approx_count_distinct``).

All register math is vectorized numpy; the only per-group work is an
elementwise-max reduce over a handful of blobs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class HyperLogLog:
    """Fixed-seed HLL with ``m = 2**p`` registers (p=12 → ~1.6% rel. error)."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 16
        self.p = p
        self.m = 1 << p
        m = self.m
        if m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / m)
        elif m == 64:
            self.alpha = 0.709
        elif m == 32:
            self.alpha = 0.697
        else:
            self.alpha = 0.673

    def registers(self, values: np.ndarray) -> np.ndarray:
        """uint8[m] register vector for a value array (any dtype pandas'
        siphash accepts)."""
        h = pd.util.hash_array(np.asarray(values))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = leading-zero count of w in (64-p)-bit space, + 1
        bits = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        # bit_length via exponent extraction; for w >= 2^53 round-to-nearest
        # float conversion can carry UP across a power of two (2^54-1 ->
        # 2^54), never down (2^(b-1) is exactly representable), so correct
        # the one-off overestimate with an exact integer compare
        bf = np.frexp(w[nz].astype(np.float64))[1]
        sh = np.minimum(bf - 1, 63).astype(np.uint64)  # avoid shift-by-64
        over = (bf > 64) | (w[nz] < (np.uint64(1) << sh))
        bits[nz] = bf - over
        rho = (64 - self.p) - bits + 1
        regs = np.zeros(self.m, dtype=np.uint8)
        np.maximum.at(regs, idx, rho.astype(np.uint8))
        return regs

    @staticmethod
    def merge(blobs) -> np.ndarray:
        return np.maximum.reduce([np.frombuffer(b, dtype=np.uint8) for b in blobs])

    def estimate(self, regs: np.ndarray) -> int:
        regs = regs.astype(np.float64)
        e = self.alpha * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int(np.sum(regs == 0))
        if e <= 2.5 * self.m and zeros > 0:  # small-range (linear counting)
            e = self.m * np.log(self.m / zeros)
        return int(round(e))
