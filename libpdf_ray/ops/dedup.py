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


def exact_dedup_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(content_hash, keep_id, n_copies) — keep_id is the min id per group.

    Shape: per-batch combiner (min-id + count per hash within the batch) →
    ONE hash shuffle → pandas combine per partition.  ``Dataset.aggregate``
    is avoided on purpose: measured 14-55 s on 15k-50k-key groupbys where
    this shape costs a few seconds (BASELINE.md bench notes)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = add_content_hash(df, text_col)
        g = df.groupby("content_hash", as_index=False).agg(
            keep_id=(id_col, "min"), n_copies=(id_col, "size")
        )
        g["n_copies"] = g["n_copies"].astype("int64")
        # bucket key: co-group by hash prefix so the combine runs one
        # vectorized pandas groupby per BUCKET, not one call per key
        g["bucket"] = [int(h[:2], 16) % 16 for h in g["content_hash"]]
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", as_index=False).agg(
            keep_id=("keep_id", "min"), n_copies=("n_copies", "sum")
        )
        out["n_copies"] = out["n_copies"].astype("int64")
        return out

    return partials.groupby("bucket", num_partitions=8).map_groups(
        combine, batch_format="pandas"
    )


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Return the dataset with exact duplicates removed (keep min id).

    Bucketed co-group (see exact_dedup_stats): one vectorized
    drop_duplicates per bucket partition."""

    def hash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = add_content_hash(df, text_col)
        df["bucket"] = [int(h[:2], 16) % 16 for h in df["content_hash"]]
        return df

    hashed = ds.map_batches(hash_bucket, batch_format="pandas")

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(id_col)
            .drop_duplicates("content_hash")
            .drop(columns=["bucket"])
        )

    return hashed.groupby("bucket", num_partitions=8).map_groups(
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


def _band_rows(df: pd.DataFrame, bands: int, rows: int, id_col: str) -> pd.DataFrame:
    out_band, out_hash, out_id, out_sig = [], [], [], []
    for _, row in df.iterrows():
        sig = row["minhash"]
        for bi in range(bands):
            chunk = tuple(sig[bi * rows : (bi + 1) * rows])
            out_band.append(bi)
            out_hash.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
            out_id.append(row[id_col])
            out_sig.append(sig)
    return pd.DataFrame(
        {"band": out_band, "band_hash": out_hash, id_col: out_id, "minhash": out_sig}
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
    """
    rows = num_perm // bands
    with_sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas",
        concurrency=4,
        num_cpus=0.5,
    )
    exploded = with_sig.map_batches(
        lambda df: _band_rows(df, bands, rows, id_col), batch_format="pandas"
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        id_dtype = group[id_col].dtype
        out_a, out_b, out_j = [], [], []
        if len(group) >= 2:
            group = group.sort_values(id_col).drop_duplicates(id_col)
            ids = group[id_col].tolist()
            sigs = [np.asarray(s) for s in group["minhash"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    jac = float(np.mean(sigs[i] == sigs[j]))
                    if jac >= threshold:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(round(jac, 4))
        # empty frames must carry the same dtypes as non-empty ones — the
        # hash-shuffle operator unifies block schemas strictly
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype=id_dtype),
                "id_b": pd.Series(out_b, dtype=id_dtype),
                "jaccard": pd.Series(out_j, dtype="float64"),
            }
        )

    pairs = exploded.groupby(["band", "band_hash"], num_partitions=8).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    # distinct pairs (a doc pair can collide in several bands).  The pair
    # set is ≪ the corpus (only near-dup candidates), so the dedup runs in
    # one small task; a second shuffle here would also trip Ray's
    # hash-shuffle on the empty-schema blocks map_groups emits for empty
    # partitions.
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if "id_a" not in df.columns:
            return df
        return df.drop_duplicates(["id_a", "id_b"]).sort_values(["id_a", "id_b"])

    return pairs.repartition(1).map_batches(
        dedup_pairs, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (actor-pool stage)."""

    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        tokens = text.split()
        if not tokens:
            return 0
        acc = np.zeros(self.bits, dtype=np.int64)
        for tok in tokens:
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8", "ignore")).digest()[:8], "little"
            )
            for bit in range(self.bits):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        out = 0
        for bit in range(self.bits):
            if acc[bit] > 0:
                out |= 1 << bit
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = [
            f"{self.simhash(t or ''):016x}" for t in batch["text"].fillna("")
        ]
        return batch


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


class HyperplaneBucketer:
    """Sign-bit LSH bucket for embeddings; planes drawn once per worker from
    a fixed seed so buckets agree across the pool."""

    def __init__(self, dim: int = 64, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in batch["embedding"]])
        bits = (emb @ self.planes) > 0
        batch["bucket"] = [
            int("".join("1" if b else "0" for b in row), 2) for row in bits
        ]
        # re-wrap embeddings as plain python lists: the downstream bucket
        # shuffle converts the block to Arrow, which cannot re-infer the
        # per-cell numpy.ndarray dtype pandas gives Arrow list columns
        batch["embedding"] = [
            [float(v) for v in row] for row in emb
        ]
        return batch


def embedding_neardup_pairs(ds, id_col: str = "vec_id", threshold: float = 0.95,
                            dim: int = 64, n_planes: int = 12):
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold, found via
    hyperplane buckets (near-identical vectors agree on every sign bit)."""
    bucketed = ds.map_batches(
        HyperplaneBucketer,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pandas",
        concurrency=4,
        num_cpus=0.5,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        id_dtype = group[id_col].dtype
        out_a, out_b, out_c = [], [], []
        if len(group) >= 2:
            group = group.sort_values(id_col)
            ids = group[id_col].tolist()
            emb = np.stack([np.asarray(e, dtype=np.float64) for e in group["embedding"]])
            norms = np.linalg.norm(emb, axis=1)
            sims = (emb @ emb.T) / np.outer(norms, norms)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if sims[i, j] >= threshold:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_c.append(round(float(sims[i, j]), 4))
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype=id_dtype),
                "id_b": pd.Series(out_b, dtype=id_dtype),
                "cosine": pd.Series(out_c, dtype="float64"),
            }
        )

    return bucketed.groupby("bucket", num_partitions=8).map_groups(bucket_pairs, batch_format="pandas")
