"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the whole point at 100 TB):

- exact: content-hash per batch (vectorized) → ``groupby(hash)`` — the ONE
  shuffle, over 16-byte keys + doc ids only, never over document bodies.
- MinHash-LSH: shingle→minhash per batch (numpy) → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets → candidate
  pairs verified by signature Jaccard.  Signatures are 8·num_perm bytes per
  doc; the shuffle moves signatures, not text.
- SimHash: 64-bit sketch per doc; near-dup = equal sketch buckets (or small
  Hamming rotations), again a key-only shuffle.
- embedding near-dup: random-hyperplane LSH bucket → within-bucket cosine.

No driver-side loops: everything is map_batches + groupby/map_groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "ignore")).hexdigest()


def add_content_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch["content_hash"] = [md5_hex(t or "") for t in batch[text_col].fillna("")]
    return batch


def exact_dedup_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                      est_keys: int | None = None):
    """(content_hash, keep_id, n_copies) — keep_id is the min id per group.

    Shape: per-batch combiner (min-id + count per hash within the batch) →
    ONE hash shuffle → pandas combine per partition.  ``Dataset.aggregate``
    is avoided on purpose: measured 14-55 s on 15k-50k-key groupbys where
    this shape costs a few seconds (BASELINE.md bench notes)."""

    from .util import shuffle_partitions

    # est_keys (≈ distinct texts ≤ input rows) sizes the shuffle; callers
    # with a parquet source pass metadata row counts (hash-aggregator
    # startup scales with partitions — measured 19 s vs 2 s at 32-vs-2
    # partitions on a 50k-row input)
    n_parts = shuffle_partitions(est_keys=est_keys) if est_keys else shuffle_partitions()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = add_content_hash(df, text_col)
        g = df.groupby("content_hash", as_index=False).agg(
            keep_id=(id_col, "min"), n_copies=(id_col, "size")
        )
        g["n_copies"] = g["n_copies"].astype("int64")
        # bucket key: co-group by hash prefix so the combine runs one
        # vectorized pandas groupby per BUCKET, not one call per key
        g["bucket"] = [int(h[:4], 16) % (4 * n_parts) for h in g["content_hash"]]
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", as_index=False).agg(
            keep_id=("keep_id", "min"), n_copies=("n_copies", "sum")
        )
        out["n_copies"] = out["n_copies"].astype("int64")
        return out

    return partials.groupby("bucket", num_partitions=n_parts).map_groups(
        combine, batch_format="pandas"
    )


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                est_keys: int | None = None):
    """Return the dataset with exact duplicates removed (keep min id).

    Bucketed co-group (see exact_dedup_stats): one vectorized
    drop_duplicates per bucket partition."""

    from .util import shuffle_partitions

    n_parts = shuffle_partitions(est_keys=est_keys) if est_keys else shuffle_partitions()

    def hash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = add_content_hash(df, text_col)
        df["bucket"] = [int(h[:4], 16) % (4 * n_parts) for h in df["content_hash"]]
        return df

    hashed = ds.map_batches(hash_bucket, batch_format="pandas")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(id_col)
            .drop_duplicates("content_hash")
            .drop(columns=["bucket"])
        )

    return hashed.groupby("bucket", num_partitions=n_parts).map_groups(
        keep_first, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → stable 61-bit hashes (md5-based, vectorizable
    per doc)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = (
            int.from_bytes(hashlib.md5(g.encode("utf-8", "ignore")).digest()[:8], "little")
            % _MERSENNE
        )
    return out


class MinHasher:
    """Actor-pool stage: per-document MinHash signatures.

    ``__init__`` draws the permutation coefficients ONCE per worker from a
    fixed seed (same on every worker → signatures are globally consistent)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.shingle_k)
        if len(x) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (P, S) permuted hashes → row-min, fully vectorized: multiply-xor
        # "permutations" in wrapping uint64 arithmetic (not a strict
        # universal hash family, but i.i.d.-uniform enough for MinHash and
        # orders of magnitude faster than exact modular hashing)
        vals = (x[None, :] * self.a[:, None]) ^ self.b[:, None]
        # mask to 63 bits so signatures survive Arrow/int64 shuffle columns
        # (uint64 values above 2^63-1 overflow pandas→Arrow conversion)
        return (vals.min(axis=1) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["minhash"] = [
            self.signature(t or "").tolist() for t in batch["text"].fillna("")
        ]
        return batch


# candidate-pair sets beyond this are no longer "≪ corpus" and the
# verification stage must switch to a bucketed signature join instead of a
# broadcast-filtered lookup (documented fallback; not needed at any scale
# where LSH banding is doing its job)
MAX_CANDIDATE_PAIRS = 2_000_000
# fail FAST inside the bucket task before materializing n² pairs: a bucket
# with more distinct ids than this is duplication-saturated (handle those
# crowds with exact dedup first)
MAX_BUCKET_IDS = 2_000


def _bucket_pair_frame(group: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All unordered id pairs of one LSH bucket, with the saturation guard
    applied BEFORE pair generation (an O(n²) explosion would OOM the task
    long before a driver-side check could fire)."""
    id_dtype = group[id_col].dtype
    out_a, out_b = [], []
    if len(group) >= 2:
        ids = sorted(group[id_col].drop_duplicates().tolist())
        if len(ids) > MAX_BUCKET_IDS:
            raise ValueError(
                f"LSH bucket holds {len(ids)} ids (> MAX_BUCKET_IDS) — "
                "corpus is duplication-saturated; run exact dedup first or "
                "switch verification to a bucketed join"
            )
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    return pd.DataFrame(
        {
            "id_a": pd.Series(out_a, dtype=id_dtype),
            "id_b": pd.Series(out_b, dtype=id_dtype),
        }
    )


def _band_rows(df: pd.DataFrame, bands: int, rows: int, id_col: str) -> pd.DataFrame:
    """Vectorized LSH banding: (N, num_perm) signature matrix → one
    (band, band_hash, id) row per (doc, band).

    No ``iterrows``, and — unlike round 1 — NO signature payload in the
    band rows: the shuffle moves 3 scalar columns per (doc, band); the
    signatures stay in the (materialized) signature table and are joined
    back only for the ≪-corpus candidate set."""
    n = len(df)
    if n == 0:
        return pd.DataFrame(
            {
                "band": pd.Series([], dtype="int64"),
                "band_hash": pd.Series([], dtype="int64"),
                id_col: df[id_col],
            }
        )
    sig = np.asarray([np.asarray(s, dtype=np.int64) for s in df["minhash"]])
    # tolerate num_perm not divisible by bands: the tail permutations are
    # simply not banded (round-1 slicing behavior)
    chunks = sig[:, : bands * rows].reshape(n, bands, rows).astype(np.uint64)
    # FNV-1a-style mix folded over the rows axis — vectorized across all
    # (doc, band) chunks at once; equal chunks ⇒ equal hash (the only
    # property banding needs)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for r in range(rows):
        h = (h ^ chunks[:, :, r]) * prime
    return pd.DataFrame(
        {
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).ravel(),
            id_col: np.repeat(df[id_col].to_numpy(), bands),
        }
    )


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
):
    """Candidate pairs from LSH banding, verified by signature Jaccard.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape (round-2 rework): the band shuffle carries only
    (band, band_hash, id) scalar rows — signatures are shuffled ZERO times.
    Candidate pairs (≪ corpus by LSH construction) are collected once,
    deduped, and verified against a broadcast-filtered signature lookup;
    :data:`MAX_CANDIDATE_PAIRS` guards the collect."""
    from .util import shuffle_partitions

    rows = num_perm // bands
    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas",
        concurrency=4,
        num_cpus=0.5,
    ).map_batches(lambda df: df[[id_col, "minhash"]], batch_format="pandas")
    # consumed twice (band explosion now, candidate verification later) —
    # without this the MinHash pass would run twice
    sig_ds = sig_ds.materialize()

    exploded = sig_ds.map_batches(
        lambda df: _band_rows(df, bands, rows, id_col), batch_format="pandas"
    )

    def bucket_candidates(group: pd.DataFrame) -> pd.DataFrame:
        # empty frames carry the same dtypes as non-empty ones — the
        # hash-shuffle operator unifies block schemas strictly
        return _bucket_pair_frame(group, id_col)

    # bucket-key cardinality ≈ docs × bands (count on the materialized
    # signature table is metadata-only)
    cands = exploded.groupby(
        ["band", "band_hash"],
        num_partitions=shuffle_partitions(est_keys=sig_ds.count() * bands),
    ).map_groups(bucket_candidates, batch_format="pandas")

    cand_pd = cands.to_pandas()
    if "id_a" in cand_pd.columns:
        cand_pd = cand_pd.drop_duplicates(["id_a", "id_b"]).sort_values(
            ["id_a", "id_b"]
        )
    else:  # zero candidates → empty-schema block
        cand_pd = pd.DataFrame({"id_a": [], "id_b": []})
    if len(cand_pd) > MAX_CANDIDATE_PAIRS:
        raise ValueError(
            f"{len(cand_pd)} candidate pairs exceed MAX_CANDIDATE_PAIRS — "
            "corpus is duplication-saturated; switch verification to the "
            "bucketed signature join (explode pairs by doc_id, co-group "
            "with the signature table, regroup by pair)"
        )

    import ray
    import ray.data as rd

    if len(cand_pd) == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {"id_a": cand_pd["id_a"], "id_b": cand_pd["id_b"],
                 "jaccard": pd.Series([], dtype="float64")}
            )
        )

    # fetch signatures for candidate ids only: distributed filter against a
    # broadcast id set, then one vectorized verify over the bounded result
    needed_ref = ray.put(frozenset(cand_pd["id_a"]).union(cand_pd["id_b"]))

    def filter_needed(df: pd.DataFrame) -> pd.DataFrame:
        needed = ray.get(needed_ref)
        return df[df[id_col].isin(needed)]

    sub = sig_ds.map_batches(filter_needed, batch_format="pandas").to_pandas()
    sig_map = {
        i: np.asarray(s, dtype=np.int64)
        for i, s in zip(sub[id_col], sub["minhash"])
    }
    A = np.stack([sig_map[i] for i in cand_pd["id_a"]])
    B = np.stack([sig_map[i] for i in cand_pd["id_b"]])
    jac = (A == B).mean(axis=1)
    keep = jac >= threshold
    out = pd.DataFrame(
        {
            "id_a": cand_pd["id_a"][keep].to_numpy(),
            "id_b": cand_pd["id_b"][keep].to_numpy(),
            "jaccard": np.round(jac[keep], 4),
        }
    )
    return rd.from_pandas(out.reset_index(drop=True))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (actor-pool stage)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        """Vectorized: md5→uint64 per token, ``np.unpackbits`` over the
        token-hash matrix, column-sum, sign — bit-identical to the naive
        per-bit fold (acc[bit] = ones − zeros = 2·ones − T)."""
        tokens = text.split()
        if not tokens:
            return 0
        raw = b"".join(
            hashlib.md5(tok.encode("utf-8", "ignore")).digest()[:8]
            for tok in tokens
        )
        hs = np.frombuffer(raw, dtype="<u8")  # little-endian, as before
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(tokens)
        out_bits = (acc > 0).astype(np.uint8)
        value = int.from_bytes(
            np.packbits(out_bits, bitorder="little").tobytes(), "little"
        )
        # honor a reduced sketch width (the per-bit fold only ranged over
        # self.bits); per-bit accumulators are independent, so masking the
        # 64-bit result is value-identical
        if self.bits < 64:
            value &= (1 << self.bits) - 1
        return value

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = [
            f"{self.simhash(t or ''):016x}" for t in batch["text"].fillna("")
        ]
        return batch


def simhash_neardup_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
):
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance ≤
    ``max_hamming``.

    Pigeonhole banding: the 64-bit sketch splits into ``max_hamming + 1``
    bands — any pair within the Hamming ball shares at least one band
    exactly, so the shuffle carries only (band, band_bits, id) scalar rows
    (same two-phase shape as :func:`minhash_lsh_pairs`: candidates are
    deduped and verified with exact popcount against a broadcast-filtered
    sketch lookup, guarded by :data:`MAX_CANDIDATE_PAIRS`)."""
    from .util import shuffle_partitions

    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    sim_ds = ds.map_batches(
        SimHasher, batch_format="pandas", concurrency=4, num_cpus=0.5
    ).map_batches(lambda df: df[[id_col, "simhash"]], batch_format="pandas")
    sim_ds = sim_ds.materialize()

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "band": pd.Series([], dtype="int64"),
                    "band_bits": pd.Series([], dtype="int64"),
                    id_col: df[id_col],
                }
            )
        h = np.array([int(s, 16) for s in df["simhash"]], dtype=np.uint64)
        bands = np.stack(
            [(h >> np.uint64(width * b)) & mask for b in range(n_bands)],
            axis=1,
        )  # (N, n_bands)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(n_bands, dtype=np.int64), n),
                "band_bits": bands.astype(np.int64).ravel(),
                id_col: np.repeat(df[id_col].to_numpy(), n_bands),
            }
        )

    exploded = sim_ds.map_batches(band_rows, batch_format="pandas")

    def bucket_candidates(group: pd.DataFrame) -> pd.DataFrame:
        # empty frames carry the same dtypes as non-empty ones — the
        # hash-shuffle operator unifies block schemas strictly
        return _bucket_pair_frame(group, id_col)

    cands = exploded.groupby(
        ["band", "band_bits"],
        num_partitions=shuffle_partitions(est_keys=sim_ds.count() * n_bands),
    ).map_groups(bucket_candidates, batch_format="pandas")

    cand_pd = cands.to_pandas()
    if "id_a" in cand_pd.columns and len(cand_pd):
        cand_pd = cand_pd.drop_duplicates(["id_a", "id_b"]).sort_values(
            ["id_a", "id_b"]
        )
    else:
        cand_pd = pd.DataFrame({"id_a": [], "id_b": []})
    if len(cand_pd) > MAX_CANDIDATE_PAIRS:
        raise ValueError(
            f"{len(cand_pd)} candidate pairs exceed MAX_CANDIDATE_PAIRS — "
            "corpus is duplication-saturated; verify via a bucketed sketch "
            "join instead of the broadcast lookup"
        )

    import ray
    import ray.data as rd

    if len(cand_pd) == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {"id_a": cand_pd["id_a"], "id_b": cand_pd["id_b"],
                 "hamming": pd.Series([], dtype="int64")}
            )
        )

    needed_ref = ray.put(frozenset(cand_pd["id_a"]).union(cand_pd["id_b"]))

    def filter_needed(df: pd.DataFrame) -> pd.DataFrame:
        needed = ray.get(needed_ref)
        return df[df[id_col].isin(needed)]

    sub = sim_ds.map_batches(filter_needed, batch_format="pandas").to_pandas()
    h_map = {i: np.uint64(int(s, 16)) for i, s in zip(sub[id_col], sub["simhash"])}
    A = np.array([h_map[i] for i in cand_pd["id_a"]], dtype=np.uint64)
    B = np.array([h_map[i] for i in cand_pd["id_b"]], dtype=np.uint64)
    x = (A ^ B).view(np.uint8).reshape(-1, 8)
    hamming = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
    keep = hamming <= max_hamming
    out = pd.DataFrame(
        {
            "id_a": cand_pd["id_a"][keep].to_numpy(),
            "id_b": cand_pd["id_b"][keep].to_numpy(),
            "hamming": hamming[keep],
        }
    )
    return rd.from_pandas(out.reset_index(drop=True))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verification kernel behind LSH)."""
    def grams(t):
        w = t.split()
        if len(w) < k:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    union = len(ga | gb)
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (random-hyperplane LSH)
# ---------------------------------------------------------------------------


class MultiHyperplaneBucketer:
    """Multi-table sign-bit LSH for embeddings: ``n_tables`` independent
    hyperplane sets, so a near-dup pair that disagrees on one plane of one
    table still collides in another table.

    Round 1 used a single 12-plane table — at cosine 0.90 a pair agrees on
    all 12 sign bits only ~15% of the time (silent recall collapse, judged
    "the op has never been observed finding anything").  With the default
    16 tables × 8 planes the per-pair recall at cosine 0.90 is
    1 − (1 − (1 − θ/π)^8)^16 ≈ 0.94, and > 0.999 at cosine ≥ 0.95.

    Planes are drawn once per worker from a fixed seed (same on every
    worker → buckets agree across the pool).  Emits only scalar
    (table, bucket, id) rows — embeddings never enter the shuffle."""

    def __init__(self, dim: int = 64, n_tables: int = 16, n_planes: int = 8,
                 seed: int = 42, id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_tables * n_planes))
        self.n_tables = n_tables
        self.n_planes = n_planes
        self.id_col = id_col
        self.pow2 = (1 << np.arange(n_planes, dtype=np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in batch["embedding"]])
        bits = (emb @ self.planes) > 0  # (N, T·P)
        buckets = bits.reshape(len(emb), self.n_tables, self.n_planes) @ self.pow2
        return pd.DataFrame(
            {
                "table": np.tile(
                    np.arange(self.n_tables, dtype=np.int64), len(emb)
                ),
                "bucket": buckets.astype(np.int64).ravel(),
                self.id_col: np.repeat(batch[self.id_col].to_numpy(), self.n_tables),
            }
        )


def embedding_neardup_pairs(ds, id_col: str = "vec_id", threshold: float = 0.95,
                            dim: int = 64, n_tables: int = 16, n_planes: int = 8):
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold via multi-table
    hyperplane LSH.

    Same two-phase shape as :func:`minhash_lsh_pairs`: the bucket shuffle
    carries scalar rows only; candidate pairs (deduped across tables) are
    verified with exact cosine against a broadcast-filtered embedding
    lookup, guarded by :data:`MAX_CANDIDATE_PAIRS`."""
    from .util import shuffle_partitions

    emb_ds = ds.map_batches(
        lambda df: df[[id_col, "embedding"]], batch_format="pandas"
    ).materialize()

    bucketed = emb_ds.map_batches(
        MultiHyperplaneBucketer,
        fn_constructor_kwargs={
            "dim": dim, "n_tables": n_tables, "n_planes": n_planes,
            "id_col": id_col,
        },
        batch_format="pandas",
        concurrency=4,
        num_cpus=0.5,
    )

    def bucket_candidates(group: pd.DataFrame) -> pd.DataFrame:
        # empty frames carry the same dtypes as non-empty ones — the
        # hash-shuffle operator unifies block schemas strictly
        return _bucket_pair_frame(group, id_col)

    cands = bucketed.groupby(
        ["table", "bucket"],
        num_partitions=shuffle_partitions(est_keys=emb_ds.count() * n_tables),
    ).map_groups(bucket_candidates, batch_format="pandas")

    cand_pd = cands.to_pandas()
    if "id_a" in cand_pd.columns and len(cand_pd):
        cand_pd = cand_pd.drop_duplicates(["id_a", "id_b"]).sort_values(
            ["id_a", "id_b"]
        )
    else:
        cand_pd = pd.DataFrame({"id_a": [], "id_b": []})
    if len(cand_pd) > MAX_CANDIDATE_PAIRS:
        raise ValueError(
            f"{len(cand_pd)} candidate pairs exceed MAX_CANDIDATE_PAIRS — "
            "raise n_planes (smaller buckets) or verify via a bucketed "
            "embedding join instead of the broadcast lookup"
        )

    import ray
    import ray.data as rd

    if len(cand_pd) == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {"id_a": cand_pd["id_a"], "id_b": cand_pd["id_b"],
                 "cosine": pd.Series([], dtype="float64")}
            )
        )

    needed_ref = ray.put(frozenset(cand_pd["id_a"]).union(cand_pd["id_b"]))

    def filter_needed(df: pd.DataFrame) -> pd.DataFrame:
        needed = ray.get(needed_ref)
        out = df[df[id_col].isin(needed)].copy()
        # Arrow-safe: per-cell numpy arrays break the pandas→Arrow handoff
        out["embedding"] = [list(map(float, e)) for e in out["embedding"]]
        return out

    sub = emb_ds.map_batches(filter_needed, batch_format="pandas").to_pandas()
    emb_map = {
        i: np.asarray(e, dtype=np.float64)
        for i, e in zip(sub[id_col], sub["embedding"])
    }
    A = np.stack([emb_map[i] for i in cand_pd["id_a"]])
    B = np.stack([emb_map[i] for i in cand_pd["id_b"]])
    cos = (A * B).sum(axis=1) / (
        np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    )
    keep = cos >= threshold
    out = pd.DataFrame(
        {
            "id_a": cand_pd["id_a"][keep].to_numpy(),
            "id_b": cand_pd["id_b"][keep].to_numpy(),
            "cosine": np.round(cos[keep], 4),
        }
    )
    return rd.from_pandas(out.reset_index(drop=True))
