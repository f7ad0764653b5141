"""Mergeable sketches: HyperLogLog distinct counts and bottom-k samples.

The scale path for metrics that would otherwise need an exact all-to-all:
each batch emits one tiny serialized sketch; sketches merge associatively in
a single small task (or a tree of tasks at extreme block counts).  The
shuffle moves kilobytes regardless of corpus size.

- :class:`HLL` — classic HyperLogLog (Flajolet et al. 2007, public
  algorithm) with the standard bias/small-range corrections; register
  merge = element-wise max.
- bottom-k sketch — deterministic uniform sampling: every item gets a
  stable 64-bit hash key; the global k smallest keys are a uniform sample
  of the distinct items (and merge = k-smallest of the union), usable for
  quantile estimation without data-dependent randomness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _hash64(value) -> int:
    digest = hashlib.md5(str(value).encode("utf-8", "ignore")).digest()
    return int.from_bytes(digest[:8], "little")


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> "HLL":
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit guarantees a 1 within the usable suffix
        rest = (hashes << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = 1-based position of the first set bit from the top; latch
        # each element once its leading 1 reaches the top bit
        ranks = np.ones(len(hashes), dtype=np.uint8)
        finished = (rest >> np.uint64(63)) == 1
        work = rest.copy()
        for _ in range(64):
            if finished.all():
                break
            work = work << np.uint64(1)
            ranks[~finished] += 1
            finished |= (work >> np.uint64(63)) == 1
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        raw = alpha * m * m / inv_sum
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting small-range fix
        return raw

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


def distinct_count_sketch(ds, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col): per-batch HLL → one merge task.

    Returns a Dataset with a single row {column, estimate}."""

    def batch_sketch(df: pd.DataFrame) -> pd.DataFrame:
        hll = HLL(p)
        hashes = np.fromiter(
            (_hash64(v) for v in df[col]), dtype=np.uint64, count=len(df)
        )
        if len(hashes):
            hll.add_hashes(hashes)
        return pd.DataFrame({"sketch": [hll.to_bytes()]})

    partials = ds.map_batches(batch_sketch, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        merged = HLL(p)
        for blob in df["sketch"]:
            merged = merged.merge(HLL.from_bytes(blob, p))
        return merged

    def merge_level(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sketch": [merge(df).to_bytes()]})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"column": [col], "estimate": [float(merge(df).estimate())]}
        )

    # sketches are mergeable at every level — the tree keeps the final
    # task's input at ≤ fan_in kilobyte blobs even at 10^6 input blocks
    from .util import tree_merge

    return tree_merge(partials, merge_level, finalize)


def bottomk_sample(ds, col: str, k: int = 1024):
    """Deterministic uniform sample of ``col`` values via the k smallest
    stable hash keys.  Returns a Dataset of (key, value) rows, ≤ k."""

    def batch_bottomk(df: pd.DataFrame) -> pd.DataFrame:
        keys = np.fromiter(
            (_hash64(v) for v in df[col]), dtype=np.uint64, count=len(df)
        )
        order = np.argsort(keys)[:k]
        return pd.DataFrame(
            {
                "key": keys[order].astype("float64"),
                "value": df[col].to_numpy()[order],
            }
        )

    partials = ds.map_batches(batch_bottomk, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("key").head(k)

    from .util import tree_merge

    return tree_merge(partials, merge)


def quantile_sketch(ds, col: str, quantiles=(0.25, 0.5, 0.75, 0.95), k: int = 2048):
    """Approximate quantiles from the bottom-k uniform sample.

    Note the sample is uniform over DISTINCT values (hash keys collide for
    equal values); for heavy-tailed duplication prefer a larger k."""
    sample = bottomk_sample(ds, col, k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        values = np.sort(df["value"].to_numpy().astype(np.float64))
        qs = list(quantiles)
        ests = (
            [float(np.quantile(values, q)) for q in qs] if len(values) else [float("nan")] * len(qs)
        )
        return pd.DataFrame({"quantile": qs, "estimate": ests})

    return sample.map_batches(finish, batch_format="pandas", batch_size=None)
