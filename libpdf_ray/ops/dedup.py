"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the whole point at 100 TB):

- exact: content-hash per batch (vectorized) → ``groupby(hash)`` — the ONE
  shuffle, over 16-byte keys + doc ids only, never over document bodies.
- MinHash-LSH: shingle→minhash per batch (numpy) → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets → candidate
  pairs verified by signature Jaccard.  Signatures are 8·num_perm bytes per
  doc; the band shuffle moves only scalar rows, never signatures.
- SimHash: 64-bit sketch per doc; near-dup = pigeonhole band buckets,
  again a key-only shuffle.
- embedding near-dup: multi-table random-hyperplane LSH bucket →
  within-bucket exact cosine.

The pair families share ONE verification engine (:func:`_verified_pairs`)
with two interchangeable paths that produce identical pairs:

- **driver path** (small candidate sets): collect the deduped pairs, fetch
  the ≪-corpus payload subset via a broadcast-filtered scan, verify in one
  vectorized call.  Cheapest when pairs ≪ corpus (LSH doing its job).
- **bucketed-join path** (duplication-saturated corpora): the deduped pair
  table is hash-joined (``Dataset.join``, distributed hash shuffle) with
  the payload table once per side, then verified per batch — candidates
  never touch the driver.  ``verify_mode="auto"`` switches on this path
  above :data:`MAX_CANDIDATE_PAIRS` instead of failing.

No driver-side loops: everything is map_batches + groupby/map_groups/join.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "ignore")).hexdigest()


def add_content_hash(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch["content_hash"] = [md5_hex(t or "") for t in batch[text_col].fillna("")]
    return batch


#: below this input size the dedup shuffle is skipped — the same
#: fixed-cost reasoning as relational.SINGLE_TASK_GROUP_BYTES (Ray's
#: shuffle pays ~1.5 s of aggregator spin-up per plan regardless of data)
SINGLE_TASK_DEDUP_BYTES = 128 * 1024 * 1024


def exact_dedup_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                      est_keys: int | None = None,
                      est_bytes: int | None = None):
    """(content_hash, keep_id, n_copies) — keep_id is the min id per group.

    Shape: per-batch combiner (min-id + count per hash within the batch) →
    ONE hash shuffle → pandas combine per partition.  ``Dataset.aggregate``
    is avoided on purpose: measured 14-55 s on 15k-50k-key groupbys where
    this shape costs a few seconds (BASELINE.md bench notes).

    ``est_bytes`` (pruned input file size, when known) routes small inputs
    through ONE coalesced task — no shuffle, same kernel, same output."""

    from .util import shuffle_partitions

    if est_bytes is not None and est_bytes <= SINGLE_TASK_DEDUP_BYTES:
        def single(df: pd.DataFrame) -> pd.DataFrame:
            df = add_content_hash(df, text_col)
            g = df.groupby("content_hash", as_index=False).agg(
                keep_id=(id_col, "min"), n_copies=(id_col, "size")
            )
            g["n_copies"] = g["n_copies"].astype("int64")
            return g

        return ds.repartition(1).map_batches(
            single, batch_format="pandas", batch_size=None
        )

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
                est_keys: int | None = None,
                est_bytes: int | None = None):
    """Return the dataset with exact duplicates removed (keep min id).

    Bucketed co-group (see exact_dedup_stats): one vectorized
    drop_duplicates per bucket partition.  ``est_bytes`` small-routes
    around the shuffle, as in :func:`exact_dedup_stats`."""

    from .util import shuffle_partitions

    if est_bytes is not None and est_bytes <= SINGLE_TASK_DEDUP_BYTES:
        def single(df: pd.DataFrame) -> pd.DataFrame:
            df = add_content_hash(df, text_col)
            return df.sort_values(id_col).drop_duplicates("content_hash")

        return ds.repartition(1).map_batches(
            single, batch_format="pandas", batch_size=None
        )

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
    """Per-document MinHash signatures (batch-callable).

    ``__init__`` draws the permutation coefficients ONCE from a fixed seed
    (same everywhere → signatures are globally consistent); the tables are
    tiny, so call sites build the instance on the driver and ship it in a
    task closure rather than paying an actor pool's ramp-up."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return self.signature_of(_shingle_hashes(text, self.shingle_k))

    def signature_of(self, x: np.ndarray) -> np.ndarray:
        """Signature from precomputed shingle hashes (duplicates in ``x``
        don't change the row-min, so unique'd inputs give identical
        signatures)."""
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


# above this many (deduped) candidate pairs the driver-side collect stops
# being "≪ corpus" and verify_mode="auto" switches to the distributed
# bucketed-join path instead of collecting pairs on the driver
MAX_CANDIDATE_PAIRS = 2_000_000
# a bucket with more distinct ids than this is duplication-saturated; pair
# generation degrades to STAR pairs around the bucket's min id (n−1 rows
# instead of n²/2) so the task never materializes a quadratic frame.  For
# dedup the star is equivalent under transitive clustering (connected
# components); direct pair listings trade recall among non-representative
# members for bounded memory — logged per bucket.
MAX_BUCKET_IDS = 2_000


def _bucket_pair_frame(group: pd.DataFrame, id_col: str,
                       max_ids: int = MAX_BUCKET_IDS) -> pd.DataFrame:
    """All unordered id pairs of one LSH bucket (vectorized
    ``np.triu_indices`` — row-major (i, j>i) order over the sorted distinct
    ids, identical to the nested-loop ordering it replaces).

    Saturated buckets (> ``max_ids`` distinct ids) degrade to star pairs
    around the min id instead of raising — the O(n²) explosion would OOM
    the task, and the star keeps every member reachable from the
    representative for downstream clustering."""
    id_dtype = group[id_col].dtype
    ids = np.sort(group[id_col].drop_duplicates().to_numpy())
    n = len(ids)
    if n < 2:
        a = b = ids[:0]
    elif n > max_ids:
        logger.warning(
            "LSH bucket holds %d ids (> %d): degrading to star pairs around "
            "the representative (n-1 instead of n(n-1)/2 rows)", n, max_ids,
        )
        a = np.full(n - 1, ids[0], dtype=ids.dtype)
        b = ids[1:]
    else:
        ia, ib = np.triu_indices(n, k=1)
        a, b = ids[ia], ids[ib]
    return pd.DataFrame(
        {
            "id_a": pd.Series(a, dtype=id_dtype),
            "id_b": pd.Series(b, dtype=id_dtype),
        }
    )


def _bucket_pair_frames(bucket: pd.DataFrame, key_cols: list, id_col: str,
                        max_ids: int = MAX_BUCKET_IDS) -> pd.DataFrame:
    """Candidate pairs for EVERY LSH group inside one hash bucket, in one
    vectorized pass (round-4: ``groupby(band_keys).map_groups`` dispatched
    one Python call per distinct band hash — ~320k groups at sf0.1, 90+ s
    of pure interpreter dispatch; this runs one numpy shot per distinct
    GROUP SIZE instead).

    Semantics identical to :func:`_bucket_pair_frame` applied per group:
    sorted distinct ids, row-major (i, j>i) pairs, saturated groups
    (> ``max_ids``) degrade to star pairs around the min id (logged)."""
    id_dtype = bucket[id_col].dtype
    d = bucket.drop_duplicates([*key_cols, id_col])
    ids = d[id_col].to_numpy()
    key_arrs = [d[c].to_numpy() for c in key_cols]
    # order by (key_cols…, id): lexsort's PRIMARY key is its last element
    order = np.lexsort((ids, *key_arrs[::-1]))
    ids = ids[order]
    change = np.zeros(len(d), dtype=bool)
    if len(d):
        change[0] = True
        for a in key_arrs:
            a = a[order]
            change[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.r_[starts, len(d)])
    ia_parts, ib_parts = [], []
    for m in np.unique(sizes):
        if m < 2:
            continue
        seg = starts[sizes == m]
        if m > max_ids:
            logger.warning(
                "LSH bucket holds %d ids (> %d): degrading to star pairs "
                "around the representative (n-1 instead of n(n-1)/2 rows)",
                int(m), max_ids,
            )
            ii = np.zeros(m - 1, dtype=np.int64)
            jj = np.arange(1, m, dtype=np.int64)
        else:
            ii, jj = np.triu_indices(int(m), k=1)
        ia_parts.append((seg[:, None] + ii[None, :]).ravel())
        ib_parts.append((seg[:, None] + jj[None, :]).ravel())
    if not ia_parts:
        return pd.DataFrame(
            {"id_a": pd.Series(ids[:0], dtype=id_dtype),
             "id_b": pd.Series(ids[:0], dtype=id_dtype)}
        )
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    return pd.DataFrame(
        {"id_a": pd.Series(ids[ia], dtype=id_dtype),
         "id_b": pd.Series(ids[ib], dtype=id_dtype)}
    )


def _pack_payload(series: pd.Series, dtype) -> pd.Series:
    """List/array payload column → fixed-width ``bytes`` per row.

    pyarrow's hash join rejects list-typed non-key fields ("Data type
    list<int64> is not supported in join non-key field"), so the bucketed
    verification path ships signatures/embeddings through the join as raw
    little-endian bytes and :func:`_unpack_payload` restores the matrix."""
    return pd.Series(
        [np.ascontiguousarray(v, dtype=dtype).tobytes() for v in series],
        index=series.index,
    )


def _unpack_payload(col: pd.Series, dtype) -> np.ndarray:
    """(N,) payload column (bytes from the join path, or lists from the
    driver path) → (N, width) numpy matrix."""
    first = col.iloc[0]
    if isinstance(first, (bytes, bytearray)):
        return np.frombuffer(b"".join(col), dtype=dtype).reshape(len(col), -1)
    return np.stack([np.asarray(v, dtype=dtype) for v in col])


def _verified_pairs(
    sig_ds,
    exploded,
    bucket_keys,
    id_col: str,
    payload_col: str,
    batch_verify,
    empty_out: pd.DataFrame,
    n_items: int,
    keys_per_item: int,
    verify_mode: str = "auto",
    max_driver_pairs: int = MAX_CANDIDATE_PAIRS,
    max_bucket_ids: int = MAX_BUCKET_IDS,
    payload_encode=None,
    candidate_mode: str = "auto",
):
    """Shared two-phase pair verification for the LSH families.

    1. ``exploded`` (scalar (bucket-key…, id) rows) is hashed by its
       bucket-key TUPLE into coarse shuffle buckets; each shuffle bucket
       generates the candidate pairs of ALL its LSH groups in one
       vectorized pass (:func:`_bucket_pair_frames` — segment the sorted
       rows by key change, one ``np.triu_indices`` shot per distinct group
       size).  A per-GROUP ``map_groups`` here was one Python dispatch per
       distinct band hash: ~320k groups / 90+ s at sf0.1, measured round 4.
       Pairs are deduped DISTRIBUTED — hash the pair to a bucket, one
       vectorized ``drop_duplicates`` per bucket — and materialized (pairs
       are ≪ corpus by LSH construction; the object store spills if not).
    2. Verification against the ``payload_col`` of ``sig_ds``:

       - ``driver`` (or ``auto`` with ≤ ``max_driver_pairs`` pairs): collect
         pairs, broadcast-filter the payload table to the needed ids, one
         vectorized ``batch_verify`` call.
       - ``bucketed`` (or ``auto`` above the threshold): two distributed
         hash joins (``Dataset.join``) attach ``__pl_a``/``__pl_b`` to each
         pair row, then ``batch_verify`` runs per batch — nothing is
         collected on the driver.  This is the saturated-corpus path the
         round-2 guards only described.

    ``batch_verify`` takes a pandas frame with columns
    (id_a, id_b, __pl_a, __pl_b) and returns the verified/filtered output
    frame; both paths call the same kernel, so their pairs are identical.

    ``candidate_mode`` sizes phase 1 the way ``est_bytes`` sizes the exact
    families: when the exploded set (``n_items × keys_per_item`` scalar
    rows) is estimated under :data:`SINGLE_TASK_DEDUP_BYTES`, ``auto``
    skips BOTH chained shuffles and runs the same
    ``_bucket_pair_frames`` + ``drop_duplicates`` kernel in one coalesced
    task (~4 s of shuffle spin-up for microseconds of kernel at sf0.1,
    measured round 5).  ``single`` / ``distributed`` force a route for the
    equality tests; phase 2 is shared verbatim (:func:`_verify_candidates`).
    """
    import ray
    import ray.data as rd

    from .util import shuffle_partitions

    if verify_mode not in ("auto", "driver", "bucketed"):
        raise ValueError(f"unknown verify_mode {verify_mode!r}")
    if candidate_mode not in ("auto", "single", "distributed"):
        raise ValueError(f"unknown candidate_mode {candidate_mode!r}")

    # size-adaptive candidate generation (same fixed-cost reasoning as
    # SINGLE_TASK_DEDUP_BYTES): the exploded set is n_items×keys_per_item
    # scalar rows (~40 B each: 2-3 int64/hex keys + id).  Below the
    # threshold the two chained shuffles (group bucket + pair dedup) cost
    # ~2 s of spin-up each for microseconds of kernel — run the SAME
    # kernel (_bucket_pair_frames + drop_duplicates) in one coalesced
    # task instead.  Route-equality is pinned in tests/test_dedup_paths.py.
    est_exploded_bytes = n_items * keys_per_item * 40
    take_single = candidate_mode == "single"
    if candidate_mode == "auto" and est_exploded_bytes <= SINGLE_TASK_DEDUP_BYTES:
        # the INPUT gate alone is not enough: a duplication-saturated
        # corpus under the byte threshold can still emit a quadratic pair
        # OUTPUT (a 2000-doc near-identical cluster is 2M pair rows per
        # band) that one task would materialize whole where the
        # distributed route spreads it across gbuckets.  The exploded set
        # is bounded by the gate, so count the EXACT pairs the kernel
        # would emit (one cheap scalar task, same group-size/star rules as
        # _bucket_pair_frames) and only coalesce when that output is also
        # bounded.
        exploded = exploded.materialize()

        def exact_pair_count(df: pd.DataFrame) -> pd.DataFrame:
            sizes = (
                df.drop_duplicates([*bucket_keys, id_col])
                .groupby(bucket_keys, sort=False)
                .size()
                .to_numpy(dtype=np.int64)
            )
            pairs = np.where(
                sizes > max_bucket_ids, sizes - 1, sizes * (sizes - 1) // 2
            ).sum()
            return pd.DataFrame({"n": [int(pairs)]})

        n_cand = (
            exploded.repartition(1)
            .map_batches(exact_pair_count, batch_format="pandas",
                         batch_size=None)
            .to_pandas()["n"][0]
        )
        take_single = n_cand <= max_driver_pairs

    if take_single:
        def single_candidates(df: pd.DataFrame) -> pd.DataFrame:
            return _bucket_pair_frames(
                df, bucket_keys, id_col, max_ids=max_bucket_ids
            ).drop_duplicates(["id_a", "id_b"])

        deduped = exploded.repartition(1).map_batches(
            single_candidates, batch_format="pandas", batch_size=None
        ).materialize()
        n_pairs = deduped.count()
        if n_pairs == 0:
            return rd.from_pandas(empty_out)
        return _verify_candidates(
            deduped, n_pairs, sig_ds, id_col, payload_col, batch_verify,
            n_items, verify_mode, max_driver_pairs, payload_encode,
        )

    n_parts = shuffle_partitions(est_keys=n_items * keys_per_item)
    group_mod = 4 * n_parts

    def add_group_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse shuffle bucket from the bucket-key TUPLE; the exact group
        # boundaries are recovered inside each bucket by key segmentation
        # (no per-group dispatch, and a 64-bit row-hash collision merely
        # co-locates two groups — they stay separate in the segmentation)
        h = pd.util.hash_pandas_object(df[bucket_keys], index=False).to_numpy()
        return df.assign(gbucket=(h % np.uint64(group_mod)).astype("int64"))

    def bucket_candidates(bucket: pd.DataFrame) -> pd.DataFrame:
        # empty frames carry the same dtypes as non-empty ones — the
        # hash-shuffle operator unifies block schemas strictly
        return _bucket_pair_frames(
            bucket.drop(columns=["gbucket"]), bucket_keys, id_col,
            max_ids=max_bucket_ids,
        )

    from .util import normalize_blocks

    # chained-shuffle seam: see jaccard_pairs_exact — schema-less empty
    # blocks from this shuffle must not reach the pair-dedup shuffle
    cands = normalize_blocks(
        exploded.map_batches(add_group_bucket, batch_format="pandas")
        .groupby("gbucket", num_partitions=n_parts)
        .map_groups(bucket_candidates, batch_format="pandas")
    )

    # distributed pair dedup (a pair can surface from several bands/tables):
    # hash the pair key to a bucket, one vectorized drop_duplicates each
    pair_mod = 4 * n_parts

    def add_pbucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(pbucket=pd.Series([], dtype="int64"))
        key = df["id_a"].astype(str).str.cat(df["id_b"].astype(str), sep="\x00")
        h = pd.util.hash_pandas_object(key, index=False).astype("int64").abs()
        return df.assign(pbucket=h % pair_mod)

    deduped = (
        cands.map_batches(add_pbucket, batch_format="pandas")
        .groupby("pbucket", num_partitions=n_parts)
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["pbucket"]),
            batch_format="pandas",
        )
        .materialize()
    )
    n_pairs = deduped.count()
    if n_pairs == 0:
        return rd.from_pandas(empty_out)
    return _verify_candidates(
        deduped, n_pairs, sig_ds, id_col, payload_col, batch_verify,
        n_items, verify_mode, max_driver_pairs, payload_encode,
    )


def _verify_candidates(
    deduped,
    n_pairs: int,
    sig_ds,
    id_col: str,
    payload_col: str,
    batch_verify,
    n_items: int,
    verify_mode: str,
    max_driver_pairs: int,
    payload_encode,
):
    """Phase 2 of :func:`_verified_pairs`: attach payloads to the deduped
    candidate pairs and run ``batch_verify`` — driver-collect below
    ``max_driver_pairs``, distributed hash joins above."""
    import ray
    import ray.data as rd

    from .util import shuffle_partitions

    if verify_mode == "driver" or (
        verify_mode == "auto" and n_pairs <= max_driver_pairs
    ):
        cand_pd = deduped.to_pandas().sort_values(["id_a", "id_b"])
        # fetch payloads for candidate ids only: distributed filter against
        # a broadcast id set, then one vectorized verify over the bounded
        # result
        needed_ref = ray.put(frozenset(cand_pd["id_a"]).union(cand_pd["id_b"]))

        def filter_needed(df: pd.DataFrame) -> pd.DataFrame:
            needed = ray.get(needed_ref)
            return df[df[id_col].isin(needed)]

        sub = sig_ds.map_batches(filter_needed, batch_format="pandas").to_pandas()
        payloads = sub[payload_col]
        if payload_encode is not None:
            # pack ONCE per unique id: the per-pair gather then moves bytes
            # refs and _unpack_payload's single-frombuffer path takes over
            # (per-pair np.stack measured 2.1 s vs 0.05 s at 139k pairs ×
            # 64-float payloads, round 5)
            payloads = payload_encode(payloads)
        pl_map = dict(zip(sub[id_col], payloads))
        vin = pd.DataFrame(
            {
                "id_a": cand_pd["id_a"].to_numpy(),
                "id_b": cand_pd["id_b"].to_numpy(),
                "__pl_a": [pl_map[i] for i in cand_pd["id_a"]],
                "__pl_b": [pl_map[i] for i in cand_pd["id_b"]],
            }
        )
        return rd.from_pandas(batch_verify(vin).reset_index(drop=True))

    # bucketed-join path: pairs ⋈ payloads, twice (once per side).  The
    # payload-table side renames are zero-copy Arrow column selects; the
    # joins are Ray's distributed hash-shuffle joins sized by the larger of
    # (pair count, corpus size).
    import pyarrow as pa

    join_parts = shuffle_partitions(est_keys=max(n_pairs, n_items))

    if payload_encode is not None:
        # list payloads can't ride through the Arrow hash join — pack to
        # fixed-width bytes once (corpus-sized map, no shuffle)
        def encode(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {id_col: df[id_col], payload_col: payload_encode(df[payload_col])}
            )

        sig_join = sig_ds.map_batches(encode, batch_format="pandas")
    else:
        sig_join = sig_ds

    def rename_side(side: str):
        def f(t: pa.Table) -> pa.Table:
            return t.select([id_col, payload_col]).rename_columns(
                [f"id_{side}", f"__pl_{side}"]
            )

        return f

    sig_a = sig_join.map_batches(rename_side("a"), batch_format="pyarrow")
    sig_b = sig_join.map_batches(rename_side("b"), batch_format="pyarrow")
    # deduped is post-shuffle: merge away the schema-less empty blocks Ray
    # emits for unpopulated shuffle partitions before the Arrow hash join
    # chokes on them (see ops/util.py:normalize_blocks)
    from .util import normalize_blocks

    deduped = normalize_blocks(deduped)
    joined = deduped.join(sig_a, "inner", num_partitions=join_parts, on=("id_a",))
    joined = joined.join(sig_b, "inner", num_partitions=join_parts, on=("id_b",))
    return joined.map_batches(batch_verify, batch_format="pandas")


def _band_rows(df: pd.DataFrame, bands: int, rows: int, id_col: str) -> pd.DataFrame:
    """Vectorized LSH banding: (N, num_perm) signature matrix → one
    (band, band_hash, id) row per (doc, band).

    No ``iterrows``, and — unlike round 1 — NO signature payload in the
    band rows: the shuffle moves 3 scalar columns per (doc, band); the
    signatures stay in the (materialized) signature table and are joined
    back only for the candidate set."""
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
    verify_mode: str = "auto",
    max_driver_pairs: int = MAX_CANDIDATE_PAIRS,
    max_bucket_ids: int = MAX_BUCKET_IDS,
    candidate_mode: str = "auto",
):
    """Candidate pairs from LSH banding, verified by signature Jaccard.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape: the band shuffle carries only (band, band_hash, id) scalar
    rows — signatures are shuffled ZERO times in the candidate phase.
    Verification runs through :func:`_verified_pairs` (driver collect for
    small candidate sets, distributed bucketed join above
    ``max_driver_pairs``)."""
    # hasher state (permutation tables) is tiny and deterministic: build it
    # ONCE on the driver and ship it in the task closure — plain tasks
    # reach full width immediately, where a 4-actor pool spends ~0.75 s of
    # every query ramping (measured at sf0.1; same lesson as ops/html.py)
    hasher = MinHasher(num_perm=num_perm)
    sig_ds = ds.map_batches(
        lambda df: hasher(df), batch_format="pandas"
    ).map_batches(lambda df: df[[id_col, "minhash"]], batch_format="pandas")
    # consumed twice (band explosion now, candidate verification later) —
    # without this the MinHash pass would run twice
    sig_ds = sig_ds.materialize()
    n_docs = sig_ds.count()  # metadata-only after materialize

    rows = num_perm // bands
    exploded = sig_ds.map_batches(
        lambda df: _band_rows(df, bands, rows, id_col), batch_format="pandas"
    )

    def batch_verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"id_a": df.get("id_a", pd.Series([], dtype="object")),
                 "id_b": df.get("id_b", pd.Series([], dtype="object")),
                 "jaccard": pd.Series([], dtype="float64")}
            )
        A = _unpack_payload(df["__pl_a"], np.int64)
        B = _unpack_payload(df["__pl_b"], np.int64)
        jac = (A == B).mean(axis=1)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "id_a": df["id_a"].to_numpy()[keep],
                "id_b": df["id_b"].to_numpy()[keep],
                "jaccard": np.round(jac[keep], 4),
            }
        )

    empty_out = pd.DataFrame(
        {"id_a": pd.Series([], dtype="object"),
         "id_b": pd.Series([], dtype="object"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    return _verified_pairs(
        sig_ds, exploded, ["band", "band_hash"], id_col, "minhash",
        batch_verify, empty_out, n_docs, bands,
        verify_mode=verify_mode, max_driver_pairs=max_driver_pairs,
        max_bucket_ids=max_bucket_ids, candidate_mode=candidate_mode,
        payload_encode=lambda s: _pack_payload(s, np.int64),
    )


def minhash_exact_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 64,
    threshold: float = 0.5,
    verify_mode: str = "auto",
    max_driver_pairs: int = MAX_CANDIDATE_PAIRS,
    max_bucket_ids: int = MAX_BUCKET_IDS,
    candidate_mode: str = "auto",
):
    """MinHash-LSH candidate pruning + EXACT word-k-gram Jaccard verify.

    The production MinHash-dedup shape: banding prunes the pair space, the
    verify stage recomputes the TRUE jaccard from the document texts — so
    output pairs carry NO signature-estimation error.  With bands/rows sized
    for recall ≈ 1 at ``threshold`` (default 64 bands × 2 rows: a pair at
    true jaccard ``s`` is missed with probability ``(1 − s²)^64`` ≈ 1e-8 at
    s = 0.5, 1e-28 at s = 0.8) the output equals
    :func:`jaccard_pairs_exact` bit-for-bit — the DuckDB oracle gate checks
    exactly that equality, making this the LSH family's end-to-end
    correctness anchor.

    Columns ``(id_a, id_b, inter, uni, jaccard)`` with ``id_a < id_b``; the
    threshold test runs in INTEGERS (``inter·10000 ≥ round(thr·10000)·uni``)
    and ``jaccard = inter/uni`` in IEEE double division, both matching
    :func:`jaccard_pairs_exact` and its SQL oracle.

    Scale shape: identical to :func:`minhash_lsh_pairs` (scalar band rows in
    the candidate shuffle, driver-collect verify below
    ``max_driver_pairs``, distributed bucketed-join verify above) — the
    verify payload is the raw text column instead of the packed signature.
    """
    thr = int(round(threshold * 10000))

    class _SigAndGrams(MinHasher):
        """Per-doc minhash (for banding) + the unique shingle-hash set
        packed to bytes (for exact verification).  Shingles are md5-hashed
        ONCE per document here — the verify stage only intersects presorted
        integer arrays, never touching md5 again."""

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs, grams = [], []
            for t in batch[text_col].fillna(""):
                x = (
                    np.unique(_shingle_hashes(t, self.shingle_k))
                    if t.split()
                    else np.empty(0, dtype=np.uint64)
                )
                grams.append(x.astype("<u8").tobytes())
                sigs.append(self.signature_of(x).tolist())
            return pd.DataFrame(
                {id_col: batch[id_col], "minhash": sigs, "grams": grams}
            )

    # driver-built state shipped in the closure (see minhash_neardup_pairs)
    sig_and_grams = _SigAndGrams(num_perm=num_perm, shingle_k=shingle_k)
    sig_ds = ds.map_batches(
        lambda df: sig_and_grams(df), batch_format="pandas"
    )
    # consumed twice (band explosion, then grams lookup in verification)
    sig_ds = sig_ds.materialize()
    n_docs = sig_ds.count()  # metadata-only after materialize

    rows = num_perm // bands
    exploded = sig_ds.map_batches(
        lambda df: _band_rows(df, bands, rows, id_col), batch_format="pandas"
    )

    empty_out = pd.DataFrame(
        {"id_a": pd.Series([], dtype="object"),
         "id_b": pd.Series([], dtype="object"),
         "inter": pd.Series([], dtype="int64"),
         "uni": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )

    def batch_verify(df: pd.DataFrame) -> pd.DataFrame:
        """Per-pair ``np.intersect1d`` — MEASURED as the fastest shape.

        The obvious "vectorization" (concatenate every pair's gram arrays,
        one global lexsort by (pair, value), adjacent-duplicate bincount)
        was implemented and benchmarked in round 4: the loop wins at every
        realistic shape — 2.6× at 20k pairs × 20 grams, 1.1× at 50k × 8,
        18× at 2k × 2000 (see BASELINE.md round-4 kernel notes).  The
        per-pair work is already a vectorized C sort over ≤ a few hundred
        int64s; a global sort only adds O(total · log) over data that is
        already piecewise-sorted, and numpy has no segmented merge.  A
        searchsorted variant ties the loop (55 vs 54 ms) — not worth the
        extra branch."""
        ia, ib, inters, unis, jacs = [], [], [], [], []
        for id_a, id_b, pa, pb in zip(
            df["id_a"], df["id_b"], df["__pl_a"], df["__pl_b"]
        ):
            ga = np.frombuffer(pa or b"", dtype="<u8")
            gb = np.frombuffer(pb or b"", dtype="<u8")
            # zero-shingle docs are excluded, as in jaccard_pairs_exact
            if len(ga) == 0 or len(gb) == 0:
                continue
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            uni = len(ga) + len(gb) - inter
            if inter * 10000 >= thr * uni:
                ia.append(id_a)
                ib.append(id_b)
                inters.append(inter)
                unis.append(uni)
                jacs.append(inter / uni)
        if not ia:
            return empty_out
        return pd.DataFrame(
            {"id_a": ia, "id_b": ib,
             "inter": np.asarray(inters, dtype=np.int64),
             "uni": np.asarray(unis, dtype=np.int64),
             "jaccard": np.asarray(jacs, dtype=np.float64)}
        )

    return _verified_pairs(
        sig_ds, exploded, ["band", "band_hash"], id_col, "grams",
        batch_verify, empty_out, n_docs, bands,
        verify_mode=verify_mode, max_driver_pairs=max_driver_pairs,
        max_bucket_ids=max_bucket_ids, candidate_mode=candidate_mode,
    )


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
    verify_mode: str = "auto",
    max_driver_pairs: int = MAX_CANDIDATE_PAIRS,
    max_bucket_ids: int = MAX_BUCKET_IDS,
    candidate_mode: str = "auto",
):
    """(id_a, id_b, hamming) pairs with SimHash Hamming distance ≤
    ``max_hamming``.

    Pigeonhole banding: the 64-bit sketch splits into ``max_hamming + 1``
    bands — any pair within the Hamming ball shares at least one band
    exactly, so the shuffle carries only (band, band_bits, id) scalar rows.
    Verification (exact popcount) runs through :func:`_verified_pairs`."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    sim_hasher = SimHasher()  # stateless: tasks, not a pool (ramp cost)
    sim_ds = ds.map_batches(
        lambda df: sim_hasher(df), batch_format="pandas"
    ).map_batches(lambda df: df[[id_col, "simhash"]], batch_format="pandas")
    sim_ds = sim_ds.materialize()
    n_docs = sim_ds.count()

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

    def batch_verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"id_a": df.get("id_a", pd.Series([], dtype="object")),
                 "id_b": df.get("id_b", pd.Series([], dtype="object")),
                 "hamming": pd.Series([], dtype="int64")}
            )
        A = np.array([np.uint64(int(s, 16)) for s in df["__pl_a"]], dtype=np.uint64)
        B = np.array([np.uint64(int(s, 16)) for s in df["__pl_b"]], dtype=np.uint64)
        x = (A ^ B).view(np.uint8).reshape(-1, 8)
        hamming = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        keep = hamming <= max_hamming
        return pd.DataFrame(
            {
                "id_a": df["id_a"].to_numpy()[keep],
                "id_b": df["id_b"].to_numpy()[keep],
                "hamming": hamming[keep],
            }
        )

    empty_out = pd.DataFrame(
        {"id_a": pd.Series([], dtype="object"),
         "id_b": pd.Series([], dtype="object"),
         "hamming": pd.Series([], dtype="int64")}
    )
    return _verified_pairs(
        sim_ds, exploded, ["band", "band_bits"], id_col, "simhash",
        batch_verify, empty_out, n_docs, n_bands,
        verify_mode=verify_mode, max_driver_pairs=max_driver_pairs,
        max_bucket_ids=max_bucket_ids, candidate_mode=candidate_mode,
    )


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


#: Default stop-gram cutoff for :func:`jaccard_pairs_exact`.  A gram shared
#: by b documents emits b²/2 pair rows, so an unbounded hot shingle is a
#: quadratic blow-up; 10k is far above any legitimate natural-language
#: shingle document-frequency at the tested scales (measured max 25 at
#: sf0.1) while bounding a pathological gram to ~5·10⁷ rows.
DEFAULT_JACCARD_MAX_DF = 10_000


def _log_dropped_grams(sizes: np.ndarray, max_df: int | None) -> int:
    """No silent caps: log what the stop-gram cutoff drops in this bucket.
    Returns the dropped-gram count (0 when nothing is cut)."""
    if max_df is None or len(sizes) == 0 or sizes.max() <= max_df:
        return 0
    n_drop = int((sizes > max_df).sum())
    logging.getLogger(__name__).warning(
        "jaccard_pairs_exact: dropping %d gram(s) with document frequency "
        "> max_df=%d (max observed df=%d); pass max_df=None for the fully "
        "exact mode",
        n_drop, max_df, int(sizes.max()),
    )
    return n_drop


def _gram_pairs(bucket: pd.DataFrame, id_col: str,
                max_df: int | None) -> pd.DataFrame:
    """Per-gram candidate pair rows (id_a, id_b, n_a, n_b) for every gram
    group in ``bucket`` — one numpy shot per DISTINCT gram-frequency, the
    jaccard analog of :func:`_bucket_pair_frames`.  Shared verbatim by the
    distributed (per-gbucket) and single-task routes."""
    empty = pd.DataFrame({"id_a": bucket[id_col].iloc[:0],
                          "id_b": bucket[id_col].iloc[:0],
                          "n_a": pd.Series([], dtype="int64"),
                          "n_b": pd.Series([], dtype="int64")})
    if len(bucket) < 2:
        return empty
    order = np.lexsort((bucket[id_col].to_numpy(),
                        bucket["gram"].to_numpy()))
    grams = bucket["gram"].to_numpy()[order]
    ids = bucket[id_col].to_numpy()[order]
    ns = bucket["n"].to_numpy()[order]
    starts = np.flatnonzero(np.r_[True, grams[1:] != grams[:-1]])
    sizes = np.diff(np.r_[starts, len(grams)])
    _log_dropped_grams(sizes, max_df)
    ia_parts, ib_parts = [], []
    # one numpy shot per DISTINCT gram-frequency (heavy-tailed -> a
    # handful of sizes), not per gram
    for m in np.unique(sizes):
        if m < 2 or (max_df is not None and m > max_df):
            continue
        seg_starts = starts[sizes == m]
        ii, jj = np.triu_indices(m, k=1)
        ia_parts.append((seg_starts[:, None] + ii[None, :]).ravel())
        ib_parts.append((seg_starts[:, None] + jj[None, :]).ravel())
    if not ia_parts:
        return empty
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                         "n_a": ns[ia], "n_b": ns[ib]})


def _finish_jaccard(bucket: pd.DataFrame, thr: int) -> pd.DataFrame:
    """(id_a, id_b, n_a, n_b) pair rows -> (id_a, id_b, inter, uni,
    jaccard) with the integer threshold test; shared by both routes."""
    if len(bucket) == 0:
        return pd.DataFrame({"id_a": bucket["id_a"],
                             "id_b": bucket["id_b"],
                             "inter": pd.Series([], dtype="int64"),
                             "uni": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    agg = (
        bucket.groupby(["id_a", "id_b"], sort=False)
        .agg(inter=("n_a", "size"), n_a=("n_a", "first"),
             n_b=("n_b", "first"))
        .reset_index()
    )
    inter = agg["inter"].to_numpy(dtype=np.int64)
    uni = (agg["n_a"].to_numpy(dtype=np.int64)
           + agg["n_b"].to_numpy(dtype=np.int64) - inter)
    keep = inter * 10000 >= thr * uni
    return pd.DataFrame({"id_a": agg["id_a"].to_numpy()[keep],
                         "id_b": agg["id_b"].to_numpy()[keep],
                         "inter": inter[keep],
                         "uni": uni[keep],
                         "jaccard": inter[keep] / uni[keep]})


def _finish_containment(bucket: pd.DataFrame, thr: int) -> pd.DataFrame:
    """(id_a, id_b, n_a, n_b) pair rows -> (id_a, id_b, inter, n_small,
    containment) where containment = inter / min(n_a, n_b) — the
    asymmetric near-dup statistic (a snippet fully quoted inside a larger
    document scores 1.0 where jaccard stays low).  Same integer boundary
    test as the jaccard finisher."""
    if len(bucket) == 0:
        return pd.DataFrame({"id_a": bucket["id_a"],
                             "id_b": bucket["id_b"],
                             "inter": pd.Series([], dtype="int64"),
                             "n_small": pd.Series([], dtype="int64"),
                             "containment": pd.Series([], dtype="float64")})
    agg = (
        bucket.groupby(["id_a", "id_b"], sort=False)
        .agg(inter=("n_a", "size"), n_a=("n_a", "first"),
             n_b=("n_b", "first"))
        .reset_index()
    )
    inter = agg["inter"].to_numpy(dtype=np.int64)
    small = np.minimum(agg["n_a"].to_numpy(dtype=np.int64),
                       agg["n_b"].to_numpy(dtype=np.int64))
    keep = inter * 10000 >= thr * small
    return pd.DataFrame({"id_a": agg["id_a"].to_numpy()[keep],
                         "id_b": agg["id_b"].to_numpy()[keep],
                         "inter": inter[keep],
                         "n_small": small[keep],
                         "containment": inter[keep] / small[keep]})


def jaccard_pairs_exact(ds, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, threshold: float = 0.5,
                        max_df: int | None = DEFAULT_JACCARD_MAX_DF,
                        est_docs: int | None = None,
                        est_bytes: int | None = None,
                        _finisher=None):
    """EXACT word-k-gram Jaccard for every document pair sharing ≥1 shingle.

    The exact companion (and recall oracle) to :func:`minhash_lsh_pairs`
    — same shingle definition, no signature approximation.  Output columns
    ``(id_a, id_b, inter, uni, jaccard)`` with ``id_a < id_b`` and
    ``jaccard = inter/uni ≥ threshold``; the threshold test runs in
    INTEGERS (``inter·10000 ≥ round(threshold·10000)·uni``) so engine and
    SQL oracle agree at the boundary bit-for-bit.

    Distributed shape (inverted-index all-pairs, à la prefix-filtering
    similarity joins):

    1. ``map_batches``: per-doc DISTINCT shingle hashes (61-bit, the
       MinHasher's) exploded to ``(gram, id, n)`` rows, where
       ``n = |shingle set|`` rides along so the pair stage needs no extra
       size join.  Bodies never leave the first stage.
    2. ``groupby(gram)`` → per-gram pair rows ``(id_a, id_b, n_a, n_b)``
       via ``np.triu_indices``.  Natural-language gram frequencies are
       heavy-tailed — ``max_df`` drops grams present in more than that
       many docs (a stop-gram cutoff; standard in exact similarity joins
       because a gram shared by b docs emits b²/2 rows).  The default is
       finite (:data:`DEFAULT_JACCARD_MAX_DF`) so a pathological hot
       shingle cannot trigger a quadratic blow-up; pass ``max_df=None``
       to opt into the fully exact mode.  Dropped grams are never silent:
       every bucket that drops one logs a warning with the count and the
       worst offender's document frequency.
    3. ``groupby(id_a, id_b)`` → ``inter`` = row count,
       ``uni = n_a + n_b − inter``, integer threshold filter.

    Both shuffles move scalar int64 rows only.  Collision note: distinct
    grams are compared by 61-bit hash; a false shared-gram needs an md5
    collision (≈2⁻⁶¹ per pair·gram) — negligible below ~10⁹ distinct
    grams, and document-level jaccard shifts by at most 1/uni.

    ``est_bytes`` (compressed source size, when the caller knows it)
    small-routes BOTH shuffles into one coalesced task running the same
    two kernels.  The estimate is explosion-aware (the window_dedup
    lesson): the EXPLODED gram set is one 24-byte row per word, ≈8× the
    compressed text bytes, so the comparison uses ``est_bytes × 8`` —
    a corpus just under the raw threshold cannot funnel a multi-GiB gram
    frame into one task.
    """
    from .util import shuffle_partitions

    thr = int(round(threshold * 10000))
    fin = _finisher if _finisher is not None else _finish_jaccard

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        grams_col, ids_col, n_col = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            g = np.unique(_shingle_hashes(text, k)) if text.split() else \
                np.empty(0, dtype=np.uint64)
            if len(g) == 0:
                continue
            grams_col.append(g.astype(np.int64))
            ids_col.append(np.full(len(g), doc_id))
            n_col.append(np.full(len(g), len(g), dtype=np.int64))
        if not grams_col:
            return pd.DataFrame({"gram": pd.Series([], dtype="int64"),
                                 id_col: df[id_col].iloc[:0],
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"gram": np.concatenate(grams_col),
                             id_col: np.concatenate(ids_col),
                             "n": np.concatenate(n_col)})

    exploded = ds.map_batches(explode, batch_format="pandas")

    n_docs = est_docs if est_docs is not None else 10_000
    n_parts = shuffle_partitions(est_keys=n_docs * 64)

    if est_bytes is not None and est_bytes * 8 <= SINGLE_TASK_DEDUP_BYTES:
        def single(df: pd.DataFrame) -> pd.DataFrame:
            return fin(_gram_pairs(df, id_col, max_df), thr)

        return exploded.repartition(1).map_batches(
            single, batch_format="pandas", batch_size=None
        )

    # per-gram / per-pair groups are tiny (mostly 2-3 rows) — shuffling by a
    # hash BUCKET and combining each bucket with one vectorized pandas/numpy
    # pass avoids Ray's per-group map_groups dispatch (the exact_dedup_stats
    # shape; measured order-of-magnitude on many-small-group workloads)
    def add_gbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["gbucket"] = (df["gram"].to_numpy() % n_parts).astype(np.int64)
        return df

    def gram_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return _gram_pairs(bucket, id_col, max_df)

    from .util import normalize_blocks

    # normalize between the chained shuffles: Ray's hash shuffle emits
    # SCHEMA-LESS empty blocks for key-partitions that got no rows, map
    # UDFs skip empties, and the next shuffle intermittently dies with
    # ArrowInvalid on the mixed block schemas (reproduced at sf0.1)
    pair_rows = normalize_blocks(
        exploded.map_batches(add_gbucket, batch_format="pandas")
        .groupby("gbucket", num_partitions=n_parts)
        .map_groups(gram_pairs, batch_format="pandas")
    )

    def add_pbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(
            df[["id_a", "id_b"]], index=False
        ).to_numpy()
        df["pbucket"] = (h % np.uint64(n_parts)).astype(np.int64)
        return df

    def finish(bucket: pd.DataFrame) -> pd.DataFrame:
        return fin(bucket, thr)

    return (
        pair_rows.map_batches(add_pbucket, batch_format="pandas")
        .groupby("pbucket", num_partitions=n_parts)
        .map_groups(finish, batch_format="pandas")
    )


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
                            dim: int = 64, n_tables: int = 16, n_planes: int = 8,
                            verify_mode: str = "auto",
                            max_driver_pairs: int = MAX_CANDIDATE_PAIRS,
                            max_bucket_ids: int = MAX_BUCKET_IDS,
                            candidate_mode: str = "auto"):
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold via multi-table
    hyperplane LSH.

    The bucket shuffle carries scalar rows only; verification (exact
    cosine) runs through :func:`_verified_pairs` — embeddings are joined
    back to the ≪-corpus candidate set, never shuffled wholesale."""
    emb_ds = ds.map_batches(
        lambda df: df[[id_col, "embedding"]], batch_format="pandas"
    ).materialize()
    n_vecs = emb_ds.count()

    # hyperplane matrices are seeded + tiny: driver-built, closure-shipped
    bucketer = MultiHyperplaneBucketer(
        dim=dim, n_tables=n_tables, n_planes=n_planes, id_col=id_col
    )
    exploded = emb_ds.map_batches(
        lambda df: bucketer(df), batch_format="pandas"
    )

    def batch_verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"id_a": df.get("id_a", pd.Series([], dtype="object")),
                 "id_b": df.get("id_b", pd.Series([], dtype="object")),
                 "cosine": pd.Series([], dtype="float64")}
            )
        A = _unpack_payload(df["__pl_a"], np.float64)
        B = _unpack_payload(df["__pl_b"], np.float64)
        cos = (A * B).sum(axis=1) / (
            np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        )
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "id_a": df["id_a"].to_numpy()[keep],
                "id_b": df["id_b"].to_numpy()[keep],
                "cosine": np.round(cos[keep], 4),
            }
        )

    empty_out = pd.DataFrame(
        {"id_a": pd.Series([], dtype="object"),
         "id_b": pd.Series([], dtype="object"),
         "cosine": pd.Series([], dtype="float64")}
    )
    return _verified_pairs(
        emb_ds, exploded, ["table", "bucket"], id_col, "embedding",
        batch_verify, empty_out, n_vecs, n_tables,
        verify_mode=verify_mode, max_driver_pairs=max_driver_pairs,
        max_bucket_ids=max_bucket_ids, candidate_mode=candidate_mode,
        payload_encode=lambda s: _pack_payload(s, np.float64),
    )


def q_normalized_dedup(sf_dir: str):
    """Exact dedup over the CANONICAL text form: whitespace-variant and
    combining-sequence-variant duplicates (invisible to raw md5 dedup)
    collapse to one group.  Composition of two tested stages — the
    normalize map (:func:`~.text.add_normalized_text`, stateless Arrow
    kernels) feeds :func:`exact_dedup_stats` unchanged with
    ``text_col="norm_text"``; same keep-min-id / n_copies semantics and
    the same size-adaptive plan as ``exact_dedup``."""
    from .text import add_normalized_text
    from .util import file_bytes, parquet_row_count, read_sized

    path = f"{sf_dir}/documents.parquet"
    ds = read_sized(path, columns=["doc_id", "text"])
    norm = ds.map_batches(add_normalized_text, batch_format="pyarrow")
    return exact_dedup_stats(
        norm,
        text_col="norm_text",
        est_keys=parquet_row_count(path),
        est_bytes=file_bytes(path),
    )


def containment_pairs_exact(ds, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 3,
                            threshold: float = 0.8,
                            max_df: int | None = DEFAULT_JACCARD_MAX_DF,
                            est_docs: int | None = None,
                            est_bytes: int | None = None):
    """EXACT shingle containment pairs: ``inter / min(|A|, |B|) ≥
    threshold`` — the asymmetric companion to :func:`jaccard_pairs_exact`
    for quote/snippet detection (a short document fully embedded in a
    long one is invisible to symmetric jaccard).  Identical inverted-index
    pipeline and integer boundary test; only the finisher differs
    (:func:`_finish_containment`)."""
    return jaccard_pairs_exact(
        ds, id_col=id_col, text_col=text_col, k=k, threshold=threshold,
        max_df=max_df, est_docs=est_docs, est_bytes=est_bytes,
        _finisher=_finish_containment,
    )


def q_containment_pairs(sf_dir: str):
    from .util import file_bytes, parquet_row_count, read_sized

    path = f"{sf_dir}/documents.parquet"
    ds = read_sized(path, columns=["doc_id", "text"])
    return containment_pairs_exact(
        ds, threshold=0.8, est_docs=parquet_row_count(path),
        est_bytes=file_bytes(path),
    )
