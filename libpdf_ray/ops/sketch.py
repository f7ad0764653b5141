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


# ---- exact heavy hitters via Misra-Gries + rescue pass --------------------


def _mg_truncate(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Reduce a (term, cnt) summary to ≤ ``k`` rows Misra-Gries style:
    subtract the (k+1)-th largest count from every counter, drop the
    non-positive ones.  Standard mergeable-summary guarantee (Agarwal et
    al., "Mergeable Summaries", PODS'12 — public algorithm): after ANY
    merge tree the surviving counts undercount true frequency by at most
    N/(k+1), so every term with true frequency > N/(k+1) survives."""
    if len(df) <= k:
        return df
    vals = df["cnt"].to_numpy()
    thr = np.partition(vals, len(vals) - (k + 1))[len(vals) - (k + 1)]
    out = df[df["cnt"] > thr].copy()
    out["cnt"] = out["cnt"] - thr
    return out


def heavy_hitters(docs, k: int = 64, text_col: str = "text"):
    """EXACT corpus-wide heavy hitters — every term with frequency
    > N/(k+1) and its exact count — without ever shuffling the
    vocabulary (the 100 TB shape; `vocab_stats` pays a vocab-sized
    exchange for the same head).

    Two passes:

    1. **Sketch**: each batch emits an exact in-batch count summary
       truncated to ≤ k rows (:func:`_mg_truncate`); summaries tree-merge
       associatively (groupby-sum then re-truncate).  Every stage output
       is ≤ k+1 rows, so the exchange moves kilobytes at any corpus
       size.  One extra marker row carries the running total token count.
    2. **Rescue**: the ≤ k candidate terms (a superset of the true heavy
       hitters, by the MG guarantee) ship to every task in the batch-fn
       closure; one more streaming pass counts ONLY candidates exactly,
       and the filter ``cnt·(k+1) > N`` keeps exactly the SQL answer.

    The merge order affects which NON-hitters pad the candidate set but
    never the final output — the rescue pass makes the operator
    deterministic and oracle-exact."""
    from .corpus import _explode_tokens
    from .util import tree_merge

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        g = ex.groupby("term", as_index=False).agg(cnt=("term", "size"))
        g["cnt"] = g["cnt"].astype("int64")
        out = _mg_truncate(g, k)
        total = pd.DataFrame({"term": [""], "cnt": [np.int64(len(ex))]})
        out = pd.concat([out.assign(is_total=np.int64(0)),
                         total.assign(is_total=np.int64(1))],
                        ignore_index=True)
        return out
    # merge is associative over arbitrary subsets (combine_partials
    # contract): groupby-sum is, and _mg_truncate only weakens counts in
    # a way the rescue pass repairs — candidate-set variance by merge
    # order is explicitly absorbed by pass 2

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["is_total", "term"], as_index=False)["cnt"].sum()
        terms = _mg_truncate(g[g["is_total"] == 0], k)
        return pd.concat([terms, g[g["is_total"] == 1]], ignore_index=True)

    summary = tree_merge(
        docs.map_batches(partial, batch_format="pandas"), merge, merge
    ).to_pandas()
    n_total = int(summary.loc[summary["is_total"] == 1, "cnt"].sum())
    candidates = frozenset(
        summary.loc[summary["is_total"] == 0, "term"].tolist()
    )
    if not candidates or n_total == 0:
        return pd.DataFrame(
            {"term": pd.Series([], dtype=object),
             "cnt": pd.Series([], dtype="int64")}
        )

    def rescue(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        ex = ex[ex["term"].isin(candidates)]
        g = ex.groupby("term", as_index=False).agg(cnt=("term", "size"))
        g["cnt"] = g["cnt"].astype("int64")
        return g

    def rescue_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False)["cnt"].sum()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False)["cnt"].sum()
        g = g[g["cnt"] * (k + 1) > n_total]
        return g.sort_values(
            ["cnt", "term"], ascending=[False, True]
        ).reset_index(drop=True).astype({"cnt": "int64"})

    return tree_merge(
        docs.map_batches(rescue, batch_format="pandas"),
        rescue_merge, finalize,
    )


def q_heavy_hitters(sf_dir: str):
    from .util import read_sized

    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return heavy_hitters(docs, k=64)
