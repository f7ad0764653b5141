"""Corpus-level text analytics for training-data curation.

Operators a large-scale LLM-data pipeline runs over the whole corpus (the
``documents`` table shape ``doc_id, text, lang, source, n_chars``), beyond
the per-document stats in :mod:`.text`:

- :func:`vocab_stats` — corpus vocabulary (term → document frequency +
  total term frequency), the DF half of TF-IDF.  Per-batch partial
  aggregation (each doc contributes its term multiset exactly once, so
  per-batch distinct-doc counts sum to the global DF), then one
  cardinality-routed combine — at warehouse scale the vocabulary (10^7-10^9
  terms) takes the bucketed co-group path, never a driver collect.
- :func:`repetition_stats` — Gopher-style per-document repetition signals
  (duplicate-token fraction, most-frequent-term share).  Entirely
  doc-local: one vectorized explode+groupby per batch, ZERO shuffles.
- :func:`hash_sample` — deterministic stratified downsampling by exact
  integer hashing (Knuth multiplicative), so the engine and any SQL engine
  agree bit-for-bit on the kept set and a re-run (or a resumed run) keeps
  identical documents.  Pure filter: no shuffle, no state.
- :func:`decontaminate` — benchmark n-gram decontamination: flag corpus
  documents sharing any word n-gram with a (small) held-out benchmark
  set.  The benchmark side is collected once and broadcast via
  ``ray.put`` (eval benchmarks are ~10^3-10^5 docs even for a 100 TB
  corpus); a size guard refuses silently unsafe broadcasts.
- :func:`customers_no_orders` — distributed ANTI-join (key-set semi
  difference): build the distinct right-side key set with a per-batch
  combiner, broadcast it (size-guarded), and mask the left side in-stream.

Tokenization is the shared :func:`tokenize_series` — lowercase, split on
``[^a-z0-9]+`` — chosen because DuckDB's ``regexp_split_to_array(lower(t),
'[^a-z0-9]+')`` produces the identical token stream, which is what makes
every operator here hash-checkable against a SQL oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .util import (
    BROADCAST_LOOKUP_ROW_LIMIT,
    combine_partials,
    parquet_row_count,
    read_sized,
    topk,
)

_TOKEN_RE = re.compile(r"[^a-z0-9]+")

# Knuth multiplicative hash over the 32-bit ring: exact integer arithmetic
# reproducible in any SQL engine (no float, no library hash).
_HASH_MULT = 2654435761
_HASH_MOD = 1 << 32


def tokenize_series(text: pd.Series) -> pd.Series:
    """Series of str → Series of token lists (lowercase, ``[^a-z0-9]+``
    separators, empty tokens dropped — DuckDB-parity tokenizer)."""
    toks = text.fillna("").str.lower().str.split(_TOKEN_RE)
    return toks.map(lambda ts: [t for t in ts if t])


def _explode_tokens(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) batch → one row per token occurrence."""
    from itertools import chain

    toks = tokenize_series(df["text"])
    counts = toks.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    return pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), counts),
            "term": np.fromiter(
                chain.from_iterable(toks), dtype=object, count=total
            ),
        }
    )


# ---------------------------------------------------------------------------
# vocabulary / document frequency
# ---------------------------------------------------------------------------


def vocab_stats(docs, est_docs: int, k: int = 50):
    """Top-``k`` corpus vocabulary terms by total term frequency.

    ``docs``: Dataset of (doc_id, text).  Returns (term, df, tf) with
    ``df`` = number of documents containing the term and ``tf`` = total
    occurrences — the corpus-wide half of TF-IDF.

    Scale shape: per-batch explode → per-batch (term, tf, df) partials
    (valid because every document lives in exactly one batch, so
    batch-local distinct-doc counts are disjoint), then ONE
    cardinality-routed combine (`combine_partials`) and a shuffle-free
    tree top-k.  The vocabulary never transits the driver.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        if not len(ex):
            return pd.DataFrame({"term": [], "tf": [], "df": []}).astype(
                {"term": object, "tf": "int64", "df": "int64"}
            )
        g = ex.groupby("term", as_index=False).agg(
            tf=("doc_id", "size"), df=("doc_id", "nunique")
        )
        return g.astype({"tf": "int64", "df": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False).sum()

    partials = docs.map_batches(partial, batch_format="pandas")
    # vocabulary cardinality heuristic: ~16 new terms per doc keeps small
    # corpora on the single-task combine and routes web-scale corpora
    # (10^8+ est keys) onto the bucketed co-group path
    agg = combine_partials(
        partials, red, ["term"], est_keys=max(64, est_docs * 16), merge_fn=red
    )
    return topk(agg, ["tf", "term"], [True, False], k)


def q_vocab_stats(sf_dir: str):
    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])
    return vocab_stats(docs, est_docs=parquet_row_count(path))


# ---------------------------------------------------------------------------
# per-document repetition signals (Gopher-style quality metrics)
# ---------------------------------------------------------------------------


def repetition_stats(docs):
    """Per-document repetition metrics: ``n_tokens``, ``n_distinct``,
    ``max_tf`` (count of the most frequent term) and ``dup_frac`` =
    (n_tokens - n_distinct) / n_tokens — the fraction of token occurrences
    that are repeats (Rae et al., Gopher app. A1.1 repetition filters,
    public).  Documents with zero tokens are dropped (no defined ratio).

    Doc-local by construction: one explode + two grouped reductions per
    batch, no shuffle at any scale.  The single double division has
    identical operands in SQL, so values are bit-exact."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        if not len(ex):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=df["doc_id"].dtype),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "n_distinct": pd.Series([], dtype="int64"),
                    "max_tf": pd.Series([], dtype="int64"),
                    "dup_frac": pd.Series([], dtype="float64"),
                }
            )
        per_term = ex.groupby(["doc_id", "term"], as_index=False).agg(
            c=("term", "size")
        )
        g = per_term.groupby("doc_id", as_index=False).agg(
            n_tokens=("c", "sum"), n_distinct=("c", "size"), max_tf=("c", "max")
        )
        g = g[g["n_tokens"] > 0]
        n_tok = g["n_tokens"].to_numpy(dtype=np.int64)
        n_dis = g["n_distinct"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": n_tok,
                "n_distinct": n_dis,
                "max_tf": g["max_tf"].astype("int64"),
                "dup_frac": (n_tok - n_dis).astype("float64") / n_tok,
            }
        )

    return docs.map_batches(per_batch, batch_format="pandas")


def q_repetition_stats(sf_dir: str):
    docs = read_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return repetition_stats(docs)


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

#: per-stratum keep thresholds on the 32-bit hash ring (exact integers:
#: 0.75·2^32 for the boosted sources, 0.25·2^32 for the rest)
SAMPLE_BOOST_SOURCES = ("src0", "src1", "src2", "src3", "src4")
SAMPLE_BOOST_THRESHOLD = 3 * (1 << 30)
SAMPLE_BASE_THRESHOLD = 1 << 30


def hash_sample(docs):
    """Deterministic stratified downsample: keep a document iff
    ``(doc_id * 2654435761) mod 2^32`` falls below its stratum's
    threshold (75% for :data:`SAMPLE_BOOST_SOURCES`, 25% otherwise).

    Exact integer arithmetic end to end — any engine (and any resumed
    run) selects the identical sample, which is what makes sampling
    decisions reproducible across a 10^12-doc corpus.  Pure in-stream
    filter: no shuffle, no randomness, no state."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        # uint64 arithmetic: a wrap at 2^64 preserves the value mod 2^32
        # (2^32 divides 2^64), so the kept set stays exact even for ids
        # beyond 2^33 where int64 multiply would overflow
        h = (
            df["doc_id"].to_numpy(dtype=np.uint64) * np.uint64(_HASH_MULT)
        ) % np.uint64(_HASH_MOD)
        thr = np.where(
            df["source"].isin(SAMPLE_BOOST_SOURCES),
            SAMPLE_BOOST_THRESHOLD,
            SAMPLE_BASE_THRESHOLD,
        )
        return df.loc[h < thr, ["doc_id", "lang", "source"]]

    return docs.map_batches(keep, batch_format="pandas")


def q_hash_sample(sf_dir: str):
    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    return hash_sample(docs)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _shingle_set(tokens: list, n: int) -> set:
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def decontaminate(docs, bench_docs, n: int = 4):
    """Benchmark n-gram decontamination: for every corpus document NOT in
    the benchmark set, count the distinct word ``n``-grams it shares with
    ANY benchmark document.  Returns (doc_id, n_hits) for contaminated
    docs only (n_hits ≥ 1) — the drop set of a train/test-leakage filter
    (standard practice, e.g. GPT-3 app. C / PaLM sec. 8, public).

    Scale shape: the benchmark side (a held-out eval set — ~10^3-10^5
    docs regardless of corpus size) is reduced to its shingle set ONCE,
    put in the object store, and read zero-copy by every filter task; the
    corpus side streams.  A row-count guard refuses benchmark sets too
    large to broadcast — those want the bucketed shingle join instead.
    """
    import ray

    bench_tbl = bench_docs.to_pandas()
    if len(bench_tbl) > BROADCAST_LOOKUP_ROW_LIMIT:
        raise ValueError(
            f"benchmark set has {len(bench_tbl)} docs — too large to "
            "broadcast; shard it or use an explicit shingle-join path"
        )
    bench_ids = set(bench_tbl["doc_id"].tolist())
    shingles: set = set()
    for toks in tokenize_series(bench_tbl["text"]):
        shingles |= _shingle_set(toks, n)
    ref = ray.put(shingles)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(ref)
        mask = ~df["doc_id"].isin(bench_ids)
        sub = df.loc[mask]
        hits = [
            len(_shingle_set(toks, n) & bench)
            for toks in tokenize_series(sub["text"])
        ]
        out = pd.DataFrame(
            {"doc_id": sub["doc_id"], "n_hits": pd.array(hits, dtype="int64")}
        )
        return out[out["n_hits"] > 0]

    return docs.map_batches(flag, batch_format="pandas")


def q_decontaminate(sf_dir: str, bench_mod: int = 97):
    """Driver-contract form: the 'benchmark' is the deterministic slice
    ``doc_id % 97 == 0`` of the same corpus (stand-in for a held-out eval
    set; keeps the query self-contained on the test tables)."""
    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])

    def is_bench(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] % bench_mod == 0]

    bench = read_sized(path, columns=["doc_id", "text"]).map_batches(
        is_bench, batch_format="pandas"
    )
    return decontaminate(docs, bench)


# ---------------------------------------------------------------------------
# distributed anti-join
# ---------------------------------------------------------------------------


#: churn cutoff for the anti-join query (non-empty at every test scale)
RECENT_ORDER_CUTOFF = "2000-01-01"


def customers_no_orders(customer, orders, est_keys: int, k: int = 20):
    """Churned customers (TPC-H Q22 flavor): top-``k`` by account balance
    among customers with NO order since :data:`RECENT_ORDER_CUTOFF`.
    Distributed ANTI-join: the right side collapses to its distinct key
    set via a per-batch combiner (kilobytes per block regardless of order
    count), is broadcast once (size-guarded — beyond the limit the right
    key set belongs in a bucketed co-group, see ``relational``'s hash
    join), and the left side streams through an in-task mask."""
    import ray

    cutoff = pd.Timestamp(RECENT_ORDER_CUTOFF)

    def key_partial(df: pd.DataFrame) -> pd.DataFrame:
        recent = df.loc[pd.to_datetime(df["o_orderdate"]) >= cutoff, "o_custkey"]
        return pd.DataFrame({"o_custkey": recent.unique()})

    keys_ds = combine_partials(
        orders.map_batches(key_partial, batch_format="pandas"),
        lambda df: df.drop_duplicates("o_custkey"),
        ["o_custkey"],
        est_keys=est_keys,  # distinct custkeys are bounded by |customer|
        merge_fn=lambda df: df.drop_duplicates("o_custkey"),
    ).materialize()
    # guard BEFORE the driver collect (metadata-only count on the reduced
    # key set), so an oversized key set raises instead of OOMing the driver
    if keys_ds.count() > BROADCAST_LOOKUP_ROW_LIMIT:
        raise ValueError(
            "order key set too large to broadcast — route through the "
            "bucketed anti-join (see corpus._sample_overlap_anti_join)"
        )
    keys = keys_ds.to_pandas()
    from .util import isin_broadcast, put_id_set

    ref, as_arr = put_id_set(keys["o_custkey"].to_numpy())

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        mask = isin_broadcast(df["c_custkey"], ref, as_arr)
        return df.loc[~mask, ["c_custkey", "c_name", "c_acctbal"]]

    survivors = customer.map_batches(anti, batch_format="pandas")
    return topk(survivors, ["c_acctbal", "c_custkey"], [True, False], k)


def q_customers_no_orders(sf_dir: str):
    cpath = f"{sf_dir}/customer.parquet"
    customer = read_sized(cpath, columns=["c_custkey", "c_name", "c_acctbal"])
    orders = read_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    return customers_no_orders(customer, orders, est_keys=parquet_row_count(cpath))


def q_source_sample(sf_dir: str, per_source: int = 3):
    """Deterministic per-stratum reservoir: the ``per_source`` documents
    with the smallest Knuth-multiplicative hash in each source (ties by
    doc_id).  The grouped complement of :func:`hash_sample`'s global
    Bernoulli filter: an engine-independent "pick N per group"
    (SQL: row_number() OVER (PARTITION BY source ORDER BY hash, doc_id)).

    Scale shape: per-batch top-N per source is the combiner — every block
    collapses to ≤ N rows per source it touches — and the combine merges
    partials with the SAME reduce (min-N is associative), so the shuffle
    carries N·n_sources rows regardless of corpus size."""
    from .util import parquet_row_count

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "source"])

    def reduce_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        return df.groupby("source", as_index=False, sort=False).head(per_source)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.uint64)
        h = (ids * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
        return reduce_top(
            pd.DataFrame(
                {
                    "source": df["source"],
                    "doc_id": df["doc_id"].astype("int64"),
                    "h": h.astype("int64"),
                }
            )
        )

    picked = combine_partials(
        docs.map_batches(partial, batch_format="pandas"),
        reduce_top,
        ["source"],
        est_keys=max(16, parquet_row_count(path) // 64),
        merge_fn=reduce_top,
    )
    return picked.map_batches(
        lambda df: df[["source", "doc_id"]], batch_format="pandas"
    )


#: weighted-sampling scale: keep probability ≈ n_chars / 1000, expressed
#: as the exact integer threshold  h < n_chars · (2^32 // 1000)
WEIGHTED_SAMPLE_SCALE = (1 << 32) // 1000


def q_weighted_sample(sf_dir: str):
    """Length-weighted deterministic sampling: keep a document with
    probability ∝ its length (importance sampling for token-budget
    curation), decided by the exact integer comparison
    ``knuth_hash(doc_id) < n_chars · WEIGHTED_SAMPLE_SCALE`` — so the
    engine, any SQL engine, and any re-run agree bit-for-bit on the kept
    set.  Pure per-row filter: no shuffle, no state, no driver collect."""
    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df["doc_id"].to_numpy(dtype=np.uint64) * np.uint64(_HASH_MULT)
        ) % np.uint64(_HASH_MOD)
        thr = df["n_chars"].to_numpy(dtype=np.int64) * WEIGHTED_SAMPLE_SCALE
        return df.loc[h.astype(np.int64) < thr, ["doc_id", "n_chars", "lang"]]

    return docs.map_batches(keep, batch_format="pandas")


def _sample_candidates(df: pd.DataFrame) -> pd.DataFrame:
    """Per-row fused mask for hash_sample ∩ weighted_sample — the two pure
    predicates of :func:`q_sample_overlap` (no membership test here)."""
    ids = df["doc_id"].to_numpy(dtype=np.uint64)
    h = (ids * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
    hs = df["source"].isin(SAMPLE_BOOST_SOURCES).to_numpy()
    thr = np.where(hs, SAMPLE_BOOST_THRESHOLD, SAMPLE_BASE_THRESHOLD)
    in_hash = h < thr.astype(np.uint64)
    in_weighted = h.astype(np.int64) < (
        df["n_chars"].to_numpy(dtype=np.int64) * WEIGHTED_SAMPLE_SCALE
    )
    return df.loc[in_hash & in_weighted, ["doc_id", "source"]]


def q_sample_overlap(sf_dir: str):
    """Set algebra over predicate-defined document sets in ONE streaming
    pass: (hash_sample ∩ weighted_sample) ∖ contaminated.

    Because the first two sets are pure per-row predicates,
    INTERSECT collapses to one fused boolean mask inside ``map_batches``.
    The EXCEPT side depends on the contaminated-id cardinality — unlike a
    benchmark suite, it is proportional to corpus size, so it is
    size-guarded like every broadcast in this engine: below
    :data:`~.util.BROADCAST_LOOKUP_ROW_LIMIT` the ids are broadcast once
    (``ray.put``) and the subtraction stays in the same fused mask (zero
    shuffles); above it the candidates anti-join the contaminated ids via
    ONE doc_id-keyed bucketed co-group (both sides are id-only rows —
    document bodies never enter the exchange).  The SQL oracle states the
    same query with literal INTERSECT/EXCEPT."""
    import ray

    docs = read_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "n_chars", "source"],
    )
    bench = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda df: df[df["doc_id"] % 97 == 0], batch_format="pandas"
    )
    cont_ds = (
        decontaminate(
            read_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
            bench,
        )
        .map_batches(lambda df: df[["doc_id"]], batch_format="pandas")
        .materialize()
    )
    # guard BEFORE collecting: count() on the materialized id-only dataset
    # is metadata-only, so the oversized case never touches the driver heap
    if cont_ds.count() > BROADCAST_LOOKUP_ROW_LIMIT:
        return _sample_overlap_anti_join(docs, cont_ds)
    from .util import isin_broadcast, put_id_set

    ref, as_arr = put_id_set(cont_ds.to_pandas()["doc_id"].to_numpy())

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        out = _sample_candidates(df)
        return out.loc[~isin_broadcast(out["doc_id"], ref, as_arr)]

    return docs.map_batches(mask, batch_format="pandas")


def _sample_overlap_anti_join(docs, cont_ds):
    """Scale path for :func:`q_sample_overlap`: bucketed anti-join of the
    candidate rows against the contaminated-id set.  Tag candidates side=0
    and contaminated ids side=1, union, hash-group by doc_id bucket, and
    keep the side-0 rows whose doc_id has no side-1 row in the bucket.
    Both sides are (doc_id, source, side) scalars — one key-only shuffle."""
    from .relational import _bucketed_groups
    from .util import shuffle_partitions

    cand = docs.map_batches(
        lambda df: _sample_candidates(df).assign(_side=np.int64(0)),
        batch_format="pandas",
    )
    cont = cont_ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": "",
                "_side": np.ones(len(df), dtype="int64"),
            }
        ),
        batch_format="pandas",
    )
    n_parts = shuffle_partitions(est_keys=max(16, cont_ds.count()))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        bad = set(g.loc[g["_side"] == 1, "doc_id"])
        keep = g[(g["_side"] == 0) & ~g["doc_id"].isin(bad)]
        return keep[["doc_id", "source"]]

    return _bucketed_groups(cand.union(cont), "doc_id", n_parts, anti)


# ---------------------------------------------------------------------------
# cross-document repeated windows + per-document novelty
# ---------------------------------------------------------------------------


def _window_pairs(ds, text_col: str, id_col: str, k: int):
    """Per-doc DISTINCT k-word-window md5s, exploded to (h, doc_id) rows,
    plus each doc's distinct-window count riding as a marker row
    (``h=""``, n in a side column is not needed — the count equals the
    doc's pair-row count because windows are deduped per doc)."""
    from .dedup import md5_hex

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hs, ids = [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            w = text.split()
            if len(w) < k:
                continue
            seen = set()
            for i in range(len(w) - k + 1):
                seen.add(md5_hex(" ".join(w[i:i + k])))
            hs.extend(seen)
            ids.extend([doc_id] * len(seen))
        return pd.DataFrame({"h": pd.Series(hs, dtype="object"),
                             "doc_id": pd.Series(ids)})

    return ds.map_batches(explode, batch_format="pandas")


def q_window_dedup(sf_dir: str, k: int = 8, min_docs: int = 2):
    """Repeated k-word windows across documents — the window-granularity
    cross-doc dedup signal (the "duplicate 50-token span" shape of
    training-data dedup, scaled to the test corpus with k=8).

    Output (h, n_docs): md5 of each window text that occurs in ≥
    ``min_docs`` distinct documents, with the distinct-doc count.  Windows
    are md5-keyed so engine and SQL oracle agree bit-for-bit; only scalar
    (hash, id) rows enter the shuffle — document bodies never leave the
    explode stage."""
    from .relational import _bucketed_groups
    from .util import file_bytes, shuffle_partitions

    path = f"{sf_dir}/documents.parquet"
    ds = read_sized(path, columns=["doc_id", "text"])
    pairs = _window_pairs(ds, "text", "doc_id", k)
    n_rows = parquet_row_count(path)
    n_parts = shuffle_partitions(est_keys=n_rows * 64)

    def hot(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.drop_duplicates(["h", "doc_id"])["h"].value_counts()
        vc = vc[vc >= min_docs]
        return pd.DataFrame(
            {"h": vc.index, "n_docs": vc.to_numpy().astype("int64")}
        )

    # the routed dataset is the EXPLODED (hash, doc_id) pair set — ~64
    # windows/doc × ~48 B (32-hex md5 + id) — several times larger than
    # the compressed source; sizing the single-task route by file bytes
    # would funnel a multi-GiB frame into one repartition(1) task
    return _bucketed_groups(pairs, "h", n_parts, hot,
                            est_bytes=max(file_bytes(path), n_rows * 64 * 48))


def q_doc_novelty(sf_dir: str, k: int = 8, min_docs: int = 2):
    """Per-document novelty: the fraction of a document's distinct k-word
    windows NOT shared with any other document.

    Output (doc_id, n_windows, n_shared, novelty) for every document with
    ≥ k words; ``novelty = (n_windows − n_shared) / n_windows`` in one
    IEEE double division (oracle-identical).  Shape: the window pairs are
    bucketed by window hash ONCE — each bucket tags its shared windows and
    emits (doc_id, 1) partials — then a tiny doc-keyed sum merges with the
    per-doc window counts."""
    from .relational import _bucketed_groups
    from .util import file_bytes, shuffle_partitions

    path = f"{sf_dir}/documents.parquet"
    ds = read_sized(path, columns=["doc_id", "text"])
    pairs = _window_pairs(ds, "text", "doc_id", k)
    n_rows = parquet_row_count(path)
    # exploded-pair-set size, not source file size (see q_window_dedup)
    fb = max(file_bytes(path), n_rows * 64 * 48)
    n_parts = shuffle_partitions(est_keys=n_rows * 64)

    def tag_shared(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["h", "doc_id"])
        counts = d["h"].value_counts()
        hot = counts[counts >= min_docs].index
        per_doc = d.groupby("doc_id", sort=False).agg(
            n_windows=("h", "size")
        )
        shared = (
            d[d["h"].isin(set(hot))]
            .groupby("doc_id", sort=False)
            .agg(n_shared=("h", "size"))
        )
        out = per_doc.join(shared, how="left").fillna(0).reset_index()
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "n_windows": out["n_windows"].astype("int64"),
                "n_shared": out["n_shared"].astype("int64"),
            }
        )

    # bucket by WINDOW HASH: a window's full doc set meets in one bucket,
    # so per-bucket shared tags are globally correct; each doc's windows
    # spread over many buckets → per-doc partial sums, merged below
    per_bucket = _bucketed_groups(pairs, "h", n_parts, tag_shared,
                                  est_bytes=fb)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False, sort=False).agg(
            n_windows=("n_windows", "sum"), n_shared=("n_shared", "sum")
        )
        out["n_windows"] = out["n_windows"].astype("int64")
        out["n_shared"] = out["n_shared"].astype("int64")
        out["novelty"] = (out["n_windows"] - out["n_shared"]) / out["n_windows"]
        return out

    return combine_partials(
        per_bucket, merge, ["doc_id"],
        est_keys=n_rows, merge_fn=merge,
    )


def q_chunk_docs(sf_dir: str, k: int = 64, stride: int = 48):
    """Fixed-size training-chunk generation with overlap — the
    make-training-samples step of an LLM data pipeline: each document's
    whitespace tokens are windowed into chunks of ``k`` tokens at stride
    ``stride`` (overlap = k − stride); the final chunk may be short.

    Output (doc_id, chunk_idx, n_tokens, chunk_text).  Chunk count is
    ``max(1, ceil((len − k) / stride) + 1)`` in exact integer arithmetic
    (1 chunk for docs with ≤ k tokens), identical in the SQL oracle.
    Embarrassingly parallel: one map_batches, no shuffle — each task
    expands its own documents and only chunk rows leave the stage."""
    path = f"{sf_dir}/documents.parquet"
    ds = read_sized(path, columns=["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, idxs, ntoks, texts = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            w = text.split()
            n = len(w)
            if n == 0:
                continue
            n_chunks = 1 if n <= k else (n - k + stride - 1) // stride + 1
            for i in range(n_chunks):
                start = i * stride
                piece = w[start:start + k]
                doc_ids.append(doc_id)
                idxs.append(i)
                ntoks.append(len(piece))
                texts.append(" ".join(piece))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "n_tokens": pd.Series(ntoks, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype="object"),
            }
        )

    return ds.map_batches(chunk, batch_format="pandas")


#: mixture weights for :func:`q_mixture_sample` — upweight the first five
#: sources 3:1 (a literal, shared verbatim with the SQL oracle)
MIXTURE_WEIGHTS = {f"src{i}": 3 for i in range(5)}
MIXTURE_DEFAULT_WEIGHT = 1
MIXTURE_WEIGHT_TOTAL = 30  # 5×3 + 15×1 over the fixture's 20 sources


def q_mixture_sample(sf_dir: str):
    """Data-mixing sampler: draw a deterministic sample whose per-source
    proportions match target weights, with MAXIMUM retention — the
    "mix sources at fixed ratios" step of training-data assembly.

    Exact integer arithmetic end-to-end (engine == SQL oracle):
    ``budget B = min_j floor(n_j · W / w_j)`` (the largest total sample
    for which no source runs out), per-source quota
    ``k_i = floor(B · w_i / W)``, and each source's k_i picks are its
    smallest-Knuth-hash documents (ties by doc_id) — the same
    engine-independent selection as :func:`q_source_sample`.

    Two streaming passes: (1) per-source counts (per-batch value_counts →
    tiny fixed-key combine → driver reads n_sources rows), (2) the
    variable-quota reservoir (per-batch top-k_i per source is the
    combiner, min-k is associative, the shuffle carries ≤ Σk_i rows)."""
    from .util import parquet_row_count

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "source"])

    # pass 1: per-source counts (sources are a tiny domain)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["source"].value_counts()
        return pd.DataFrame({"source": vc.index, "n": vc.to_numpy()})

    def count_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False, sort=False)["n"].sum()

    counts = combine_partials(
        docs.map_batches(count_partial, batch_format="pandas"),
        count_merge, ["source"], est_keys=64, merge_fn=count_merge,
    ).to_pandas()

    W = MIXTURE_WEIGHT_TOTAL
    wts = {
        s: MIXTURE_WEIGHTS.get(s, MIXTURE_DEFAULT_WEIGHT)
        for s in counts["source"]
    }
    budget = min(
        int(n) * W // wts[s] for s, n in zip(counts["source"], counts["n"])
    )
    kmap = {s: budget * w // W for s, w in wts.items()}

    # pass 2: variable-quota per-source reservoir (same shape as
    # q_source_sample, with k from the mixture quota)
    def reduce_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        keep = df.groupby("source", sort=False).cumcount() < df["source"].map(
            kmap
        ).fillna(0).to_numpy()
        return df[keep]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.uint64)
        h = (ids * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
        return reduce_top(
            pd.DataFrame(
                {
                    "source": df["source"],
                    "doc_id": df["doc_id"].astype("int64"),
                    "h": h.astype("int64"),
                }
            )
        )

    picked = combine_partials(
        docs.map_batches(partial, batch_format="pandas"),
        reduce_top,
        ["source"],
        est_keys=max(16, parquet_row_count(path) // 64),
        merge_fn=reduce_top,
    )
    return picked.map_batches(
        lambda df: df[["source", "doc_id"]], batch_format="pandas"
    )


def q_group_topk(sf_dir: str, k: int = 3):
    """Top-``k`` documents by length per (lang, source) stratum with a
    dense rank — the grouped-window ``row_number() <= k`` shape (reference
    analog: per-page "largest regions" selection in the table/figure
    filters; SQL: row_number() OVER (PARTITION BY lang, source ORDER BY
    n_chars DESC, doc_id)).

    Scale shape: per-batch partial top-k per group (one vectorized
    sort + groupby.head, no per-group dispatch) collapses every block to
    ≤ k rows per stratum it touches; the associative tree merge re-selects
    — so the exchange carries ≤ k·n_strata rows at ANY corpus size, and
    n_strata is domain-bounded (languages × sources vocabularies), not
    corpus-bounded.  Ties break by doc_id for bit-exact SQL agreement."""
    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "lang", "source", "n_chars"])

    def reduce_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["lang", "source", "n_chars", "doc_id"],
            ascending=[True, True, False, True],
            kind="mergesort",
        )
        return df.groupby(["lang", "source"], as_index=False, sort=False).head(k)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        top = reduce_top(df)
        top = top.reset_index(drop=True)
        top["rank"] = top.groupby(["lang", "source"], sort=False).cumcount() + 1
        top["rank"] = top["rank"].astype("int64")
        return top[["lang", "source", "rank", "doc_id", "n_chars"]]

    return combine_partials(
        docs.map_batches(reduce_top, batch_format="pandas"),
        finalize,
        ["lang", "source"],
        # stratum count is the product of two vocabulary-bounded domains
        # (the hourly-bucket precedent in ops/relational.py): 1024 covers
        # any realistic lang x source grid and stays far under the
        # single-task combine limit
        est_keys=1024,
        merge_fn=reduce_top,
    )


def ngram_stats(docs, est_docs: int, n: int = 2, k: int = 50):
    """Top-``k`` corpus word n-grams by total frequency — the n-gram LM /
    contamination-analysis companion to :func:`vocab_stats` (same
    DuckDB-parity tokenizer, same scale shape: per-batch (gram, tf, df)
    partials are disjoint-correct because each document lives in exactly
    one batch, then one cardinality-routed combine and a shuffle-free
    tree top-k; the gram vocabulary never transits the driver)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        toks = tokenize_series(df["text"])
        grams_per_doc = toks.map(
            lambda ts: [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        )
        counts = grams_per_doc.str.len().to_numpy(dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame({"gram": [], "tf": [], "df": []}).astype(
                {"gram": object, "tf": "int64", "df": "int64"}
            )
        ex = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), counts),
                "gram": np.fromiter(
                    chain.from_iterable(grams_per_doc), dtype=object, count=total
                ),
            }
        )
        g = ex.groupby("gram", as_index=False).agg(
            tf=("doc_id", "size"), df=("doc_id", "nunique")
        )
        return g.astype({"tf": "int64", "df": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("gram", as_index=False).sum()

    partials = docs.map_batches(partial, batch_format="pandas")
    # n-gram cardinality grows faster than the unigram vocabulary: ~64 new
    # grams per doc routes web-scale corpora onto the bucketed combine
    agg = combine_partials(
        partials, red, ["gram"], est_keys=max(64, est_docs * 64), merge_fn=red
    )
    return topk(agg, ["tf", "gram"], [True, False], k)


def q_ngram_topk(sf_dir: str):
    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])
    return ngram_stats(docs, est_docs=parquet_row_count(path))


#: chars per packed training sequence for :func:`q_pack_sequences` — a
#: literal shared verbatim with the SQL oracle
PACK_BUDGET = 4096
#: docs per order-preserving scan bucket (``doc_id // width``); bounds the
#: rows any single phase-2 group holds AND the size of the driver-held
#: bucket-total frame (``~max_doc_id / width`` rows — at 10^12 docs that is
#: ~15M tiny rows; beyond that the same construction nests one more level:
#: buckets of buckets, same two-pass scan per level)
PACK_BUCKET_WIDTH = 65_536


def q_pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                     bucket_width: int = PACK_BUCKET_WIDTH):
    """Sequence packing — the make-training-batches step of an LLM data
    pipeline: concatenate all documents in ``doc_id`` order into one
    virtual character stream, cut the stream into fixed ``budget``-char
    bins, and assign each document to the bin where it STARTS (documents
    may straddle a boundary; their bin is their start offset's bin).

    Output (bin, n_docs, total_chars, first_doc, last_doc) per bin —
    bit-identical to the SQL window ``sum(n_chars) OVER (ORDER BY
    doc_id) - n_chars`` cumsum in exact integer arithmetic.

    Distributed shape — a GLOBAL ORDERED PREFIX-SCAN in two passes (the
    textbook scan, expressed in Ray Data):

    1. order-preserving coarse buckets ``doc_id // bucket_width``;
       per-batch partial sums → tiny per-bucket totals → the DRIVER
       prefix-sums the (sorted) bucket totals into exclusive bucket
       offsets and broadcasts two numpy arrays via ``ray.put``.
    2. one hash shuffle groups rows by bucket
       (:func:`~.relational._bucketed_groups` — key-disjoint, single
       vectorized kernel per bucket batch): within each bucket sort by
       ``doc_id``, local cumsum + broadcast bucket offset = the exact
       global start offset of every document; bin ids follow by integer
       division, and only per-(bucket, bin) AGGREGATE rows leave the
       kernel.
    3. bins straddling a bucket boundary merge in a small bin-keyed
       combine (sum/sum/min/max — associative).

    Document bodies never move: the scan reads two int64 columns, the
    shuffle carries 24 B/row, and the driver holds one row per bucket.
    """
    import ray

    from .relational import _bucketed_groups
    from .util import shuffle_partitions

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "n_chars"])
    n_rows = parquet_row_count(path)
    width = int(bucket_width)

    # ---- pass 1: per-bucket char totals → driver prefix → broadcast
    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["doc_id"].to_numpy(dtype=np.int64) // width
        g = pd.DataFrame(
            {"pb": b, "s": df["n_chars"].to_numpy(dtype=np.int64)}
        )
        return g.groupby("pb", as_index=False, sort=False)["s"].sum()

    def sum_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pb", as_index=False, sort=False)["s"].sum()

    n_buckets = max(1, n_rows // width + 1)
    totals = combine_partials(
        docs.map_batches(sum_partial, batch_format="pandas"),
        sum_merge, ["pb"], est_keys=n_buckets, merge_fn=sum_merge,
    ).to_pandas()  # one row per NON-EMPTY bucket (bounded, see width doc)
    totals = totals.sort_values("pb")
    bids = totals["pb"].to_numpy(dtype=np.int64)
    sums = totals["s"].to_numpy(dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(sums)[:-1])).astype(np.int64)
    bcast = ray.put((bids, offs))
    est_bins = int(sums.sum()) // budget + 1

    # ---- pass 2: within-bucket ordered cumsum + offset → bin partials
    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            pb=df["doc_id"].to_numpy(dtype=np.int64) // width
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        b_ids, b_offs = ray.get(bcast)
        g = g.sort_values(["pb", "doc_id"], kind="mergesort")
        nc = g["n_chars"].to_numpy(dtype=np.int64)
        cum = g.groupby("pb", sort=False)["n_chars"].cumsum().to_numpy(
            dtype=np.int64
        )
        base = b_offs[np.searchsorted(b_ids, g["pb"].to_numpy(np.int64))]
        start = base + cum - nc
        rows = pd.DataFrame(
            {
                "bin": start // budget,
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "n_chars": nc,
            }
        )
        out = rows.groupby("bin", as_index=False, sort=False).agg(
            n_docs=("doc_id", "size"),
            total_chars=("n_chars", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
        return out.astype(
            {"n_docs": "int64", "total_chars": "int64",
             "first_doc": "int64", "last_doc": "int64"}
        )

    pairs = docs.map_batches(add_pb, batch_format="pandas")
    n_parts = shuffle_partitions(est_keys=n_buckets, est_bytes=n_rows * 24)
    per_bucket = _bucketed_groups(
        pairs, "pb", n_parts, kernel, est_bytes=n_rows * 24
    )

    # ---- pass 3: merge straddling bins (associative min/max/sum)
    def bin_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bin", as_index=False, sort=False).agg(
            n_docs=("n_docs", "sum"),
            total_chars=("total_chars", "sum"),
            first_doc=("first_doc", "min"),
            last_doc=("last_doc", "max"),
        )
        return out.astype(
            {"n_docs": "int64", "total_chars": "int64",
             "first_doc": "int64", "last_doc": "int64"}
        ).sort_values("bin")

    return combine_partials(
        per_bucket, bin_merge, ["bin"],
        est_keys=est_bins, merge_fn=bin_merge,
    )


# ---------------------------------------------------------------------------
# collocation extraction (bigram PMI)
# ---------------------------------------------------------------------------

#: PMI score scale — idf-style integer fixed point, shared with the oracle
COLLOC_SCALE = 1_000_000
#: a bigram must occur this often to be scored (PMI is noise for rare
#: pairs; also the scale guard: score < SCALE·N/min_count, inside int64
#: for any corpus where min_count grows with log N)
COLLOC_MIN_COUNT = 5


def collocations(docs, est_docs: int, k: int = 30,
                 min_count: int = COLLOC_MIN_COUNT,
                 scale: int = COLLOC_SCALE,
                 est_bytes: int | None = None):
    """Top-``k`` collocations: bigrams ranked by the integer-scaled PMI
    ratio ``score = (c_xy · N · SCALE) // (c_x · c_y)`` (N = total token
    occurrences) with ties broken by gram — the classic collocation
    statistic in exact fixed-point form, so the SQL oracle (HUGEINT
    intermediate, same floor division) matches bit-for-bit.

    Scale shape — ONE corpus pass, then compact exchanges only (nothing
    vocabulary-broadcast):

    1. fused counts: a single tokenize per batch emits BOTH tagged
       partials — (term, cnt, is_gram=0) and (gram, cnt, is_gram=1) —
       into one cardinality-routed combine keyed on the string (the
       corpus is read and tokenized exactly once); total N is a
       ``sum()`` over the compacted unigram slice, and the
       ``min_count`` floor prunes the gram tail BEFORE any join
       (survivors ≤ N/min_count rows).
    2. the join: surviving bigrams explode into (word, role) rows and
       meet the unigram table in ONE word-hashed tagged co-group
       (`_cogrouped`, inheriting its single-task small route); scored
       rows regroup per gram (`_bucketed_groups`) where the two roles
       pivot back together.  The per-gram score uses Python ints for the
       ``c_xy·N·SCALE`` product (exceeds int64 before the division;
       result is stored int64 — bounded by SCALE·N/min_count) on the
       already-pruned candidate set only.

    Output: (gram, c_xy, c_x, c_y, score), top-k by (score DESC, gram)."""
    from itertools import chain

    from .relational import _bucketed_groups, _cogrouped
    from .util import file_bytes, shuffle_partitions  # noqa: F401

    _EMPTY = pd.DataFrame({
        "key": pd.Series([], dtype=object),
        "cnt": pd.Series([], dtype="int64"),
        "is_gram": pd.Series([], dtype="int64"),
    })

    def counts_partial(df: pd.DataFrame) -> pd.DataFrame:
        # ONE tokenize serves both count families
        toks = tokenize_series(df["text"])
        counts = toks.str.len().to_numpy(dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return _EMPTY.copy()
        flat = np.fromiter(
            chain.from_iterable(toks), dtype=object, count=total)
        u = pd.Series(flat).value_counts().rename_axis(
            "key").reset_index(name="cnt").assign(is_gram=np.int64(0))
        # bigrams stay intra-document: mask out each doc's last token
        keep = np.ones(max(total - 1, 0), dtype=bool)
        # each doc's last-token index starts a cross-document pair — mask
        # it (ends can be -1 for leading zero-token docs: exclude)
        ends = np.cumsum(counts) - 1
        keep[ends[(ends >= 0) & (ends < total - 1)]] = False
        a, b = flat[:-1][keep], flat[1:][keep]
        if len(a):
            # pandas object-str concat: C loop over PyObjects, measured
            # faster than a python f-string comprehension
            grams = pd.Series(a, dtype=object) + " " + pd.Series(
                b, dtype=object)
            g = grams.value_counts().rename_axis(
                "key").reset_index(name="cnt").assign(is_gram=np.int64(1))
            u = pd.concat([u, g], ignore_index=True)
        return u.astype({"cnt": "int64", "is_gram": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["is_gram", "key"], as_index=False)["cnt"].sum()

    both = combine_partials(
        docs.map_batches(counts_partial, batch_format="pandas"),
        red, ["key"], est_keys=max(64, est_docs * 80), merge_fn=red,
    ).materialize()
    n_tok = int(
        both.map_batches(
            lambda df: df[df["is_gram"] == 0][["cnt"]],
            batch_format="pandas",
        ).sum("cnt") or 0
    )
    if n_tok == 0:
        return pd.DataFrame({
            "gram": pd.Series([], dtype=object),
            "c_xy": pd.Series([], dtype="int64"),
            "c_x": pd.Series([], dtype="int64"),
            "c_y": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="int64"),
        })
    uni = both.map_batches(
        lambda df: df[df["is_gram"] == 0][["key", "cnt"]].rename(
            columns={"key": "term"}),
        batch_format="pandas",
    )
    big = both.map_batches(
        lambda df: df[(df["is_gram"] == 1)
                      & (df["cnt"] >= min_count)][["key", "cnt"]].rename(
            columns={"key": "gram"}),
        batch_format="pandas",
    )

    # tagged union on word: unigram rows (role 0) + exploded gram roles
    def explode_roles(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "word": pd.Series([], dtype=object),
                "gram": pd.Series([], dtype=object),
                "c_xy": pd.Series([], dtype="int64"),
                "role": pd.Series([], dtype="int64"),
            })
        w = df["gram"].str.split(" ")
        return pd.concat([
            pd.DataFrame({"word": w.str[0], "gram": df["gram"],
                          "c_xy": df["cnt"], "role": np.int64(1)}),
            pd.DataFrame({"word": w.str[1], "gram": df["gram"],
                          "c_xy": df["cnt"], "role": np.int64(2)}),
        ], ignore_index=True)

    left = uni.map_batches(
        lambda df: pd.DataFrame({
            "word": df["term"], "gram": "", "c_xy": df["cnt"],
            "role": np.int64(0)}),
        batch_format="pandas",
    )
    right = big.map_batches(explode_roles, batch_format="pandas")
    cols = ["word", "gram", "c_xy", "role"]
    tagged = left.select_columns(cols).union(right.select_columns(cols))

    def hash_word(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(key=pd.util.hash_pandas_object(
            df["word"], index=False).astype("int64").abs())

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uni_rows = g[g["role"] == 0][["word", "c_xy"]].rename(
            columns={"c_xy": "c_word"})
        gram_rows = g[g["role"] > 0][["word", "gram", "c_xy", "role"]]
        m = gram_rows.merge(uni_rows, on="word", how="inner")
        return m[["gram", "c_xy", "role", "c_word"]]

    # est_bytes (source file size) upper-bounds the compacted exchange
    # (vocab + min_count-pruned grams ≤ the raw corpus): small corpora
    # collapse both shuffles into single coalesced tasks, large ones keep
    # the distributed plan — same size-adaptive rule as the dedup family
    joined = _cogrouped(
        tagged.map_batches(hash_word, batch_format="pandas"),
        "key",
        lambda g: join_bucket(g.drop(columns=["key"])),
        num_buckets=(None if est_bytes is not None
                     else shuffle_partitions(est_keys=max(64, est_docs * 16))),
        est_bytes=est_bytes,
    )

    def score_gram(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index=["gram", "c_xy"], columns="role",
                          values="c_word", aggfunc="first").reset_index()
        p = p.rename(columns={1: "c_x", 2: "c_y"})
        p.columns.name = None
        # python-int product: c_xy·N·SCALE exceeds int64 before the
        # division; runs only over the min_count-pruned candidates
        p["score"] = [
            (int(cxy) * n_tok * scale) // (int(cx) * int(cy))
            for cxy, cx, cy in zip(p["c_xy"], p["c_x"], p["c_y"])
        ]
        return p[["gram", "c_xy", "c_x", "c_y", "score"]].astype(
            {"c_xy": "int64", "c_x": "int64", "c_y": "int64",
             "score": "int64"})

    scored = _bucketed_groups(
        joined, "gram",
        shuffle_partitions(est_keys=max(64, est_docs * 4)),
        score_gram,
        est_bytes=est_bytes,
    )
    return topk(scored, ["score", "gram"], [True, False], k)


def q_collocations(sf_dir: str):
    from .util import file_bytes

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])
    return collocations(
        docs, est_docs=parquet_row_count(path), est_bytes=file_bytes(path)
    )


# ---------------------------------------------------------------------------
# train/val/test split assignment
# ---------------------------------------------------------------------------

#: split fractions in 32-bit hash-ring units (80% / 10% / 10%); shared
#: verbatim with the SQL oracle
SPLIT_TRAIN_UPPER = int(0.8 * _HASH_MOD)
SPLIT_VAL_UPPER = int(0.9 * _HASH_MOD)


def train_split(docs):
    """Deterministic train/val/test assignment — the dataset-freeze step
    of a training pipeline: ``split = f((doc_id · 2654435761) mod 2^32)``
    cut at 80%/90% of the ring.  Same exact-integer discipline as
    :func:`hash_sample`: any engine, any resume, any cluster size
    assigns every document identically, and the assignment column rides
    along for downstream partitioned writes.  Pure in-stream map —
    no shuffle, no randomness, no state."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df["doc_id"].to_numpy(dtype=np.uint64) * np.uint64(_HASH_MULT)
        ) % np.uint64(_HASH_MOD)
        split = np.where(
            h < SPLIT_TRAIN_UPPER, "train",
            np.where(h < SPLIT_VAL_UPPER, "val", "test"),
        )
        return df.assign(split=split)

    return docs.map_batches(assign, batch_format="pandas")


def q_train_split(sf_dir: str):
    """Per-split summary (split, n_docs, n_chars, first_doc) — the
    assignment itself is checked doc-for-doc because first_doc/min and
    the counts pin the partition of the id space."""
    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    assigned = train_split(docs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("split", as_index=False).agg(
            n_docs=("doc_id", "size"), n_chars=("n_chars", "sum"),
            first_doc=("doc_id", "min"),
        )
        return g.astype(
            {"n_docs": "int64", "n_chars": "int64", "first_doc": "int64"}
        )

    def red(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("split", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_chars=("n_chars", "sum"),
            first_doc=("first_doc", "min"),
        )
        return g.astype(
            {"n_docs": "int64", "n_chars": "int64", "first_doc": "int64"}
        )

    return combine_partials(
        assigned.map_batches(partial, batch_format="pandas"),
        red, ["split"], est_keys=3, merge_fn=red,
    )


# ---------------------------------------------------------------------------
# per-language document-length percentiles
# ---------------------------------------------------------------------------


def q_doc_length_percentiles(sf_dir: str):
    """EXACT per-language doc-length percentiles (median + p95) from ONE
    distributed histogram — the corpus-profiling cut used to set length
    filters per language.

    Same shape as ``relational._grouped_price_percentile`` but both
    ranks are selected in a single walk of each group's sorted
    histogram: per-batch (lang, n_chars) counts collapse blocks to their
    distinct lengths, the combine is keyed on the (lang, length) DOMAIN
    (bounded by max doc length, not corpus size), and the final
    selection is one tiny group per language.  percentile_disc
    semantics: value at 1-based rank ceil(p·n)."""
    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "n_chars"], as_index=False)["n"].sum()

    hist = combine_partials(
        docs.map_batches(partial, batch_format="pandas"),
        red, ["lang", "n_chars"],
        est_keys=parquet_row_count(f"{sf_dir}/documents.parquet"),
        merge_fn=red,
    )

    def select_ranks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_chars")
        n = int(df["n"].sum())
        cum = df["n"].cumsum()
        out = {"lang": [df["lang"].iloc[0]],
               "n_docs": np.array([n], dtype="int64")}
        for col, p_num, p_den in (
            ("median_chars", 1, 2), ("p95_chars", 19, 20),
        ):
            rank = (p_num * n + p_den - 1) // p_den
            out[col] = np.array(
                [int(df.loc[cum >= rank, "n_chars"].iloc[0])], dtype="int64"
            )
        return pd.DataFrame(out)

    # explicit num_partitions (see _grouped_price_percentile): defaults
    # spawn aggregators beyond the key count and can stall small sessions
    return hist.groupby("lang", num_partitions=2).map_groups(
        select_ranks, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# distribution drift between sources (exact two-sample KS)
# ---------------------------------------------------------------------------

#: the reference slice for q_source_drift — shared with the SQL oracle
DRIFT_REF_SOURCE = "src0"


def q_source_drift(sf_dir: str, ref_source: str = DRIFT_REF_SOURCE):
    """EXACT two-sample Kolmogorov–Smirnov distance between the
    reference source's doc-length distribution and everything else —
    the drift check run when a new crawl/source joins a training mix.

    Integer-exact: KS = max |F0(v) − F1(v)| = max |s0·n1 − s1·n0| /
    (n0·n1), where s are cumulative counts over the merged value
    domain — the numerator is pure int64, so the max (and its argmin
    location ``ks_at``) are deterministic; ONE double division emits
    the statistic.  Shape: a (source-flag, n_chars) domain-keyed
    histogram combine (blocks collapse to distinct lengths — nothing
    scales with corpus rows) and one final sorted walk."""

    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        is_ref = (df["source"] == ref_source).to_numpy()
        g = (
            pd.DataFrame({
                "v": df["n_chars"].to_numpy(dtype=np.int64),
                "c0": is_ref.astype(np.int64),
                "c1": (~is_ref).astype(np.int64),
            })
            .groupby("v", as_index=False).sum()
        )
        return g.astype({"c0": "int64", "c1": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("v", as_index=False)[["c0", "c1"]].sum()

    hist = combine_partials(
        docs.map_batches(partial, batch_format="pandas"),
        red, ["v"],
        est_keys=parquet_row_count(f"{sf_dir}/documents.parquet"),
        merge_fn=red,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("v")
        s0 = df["c0"].to_numpy(dtype=np.int64).cumsum()
        s1 = df["c1"].to_numpy(dtype=np.int64).cumsum()
        n0, n1 = int(s0[-1]) if len(s0) else 0, int(s1[-1]) if len(s1) else 0
        if n0 == 0 or n1 == 0:
            return pd.DataFrame({
                "n_ref": np.array([n0], dtype="int64"),
                "n_other": np.array([n1], dtype="int64"),
                "ks_num": np.array([0], dtype="int64"),
                "ks_at": np.array([0], dtype="int64"),
                "ks_stat": [0.0],
            })
        # int64 bound: s0·n1 ≤ n0·n1 — exact while n0·n1 < 2^63
        # (≈3·10^9 docs per side; past that, move the walk to python
        # ints — it is one task over the length DOMAIN, not the corpus)
        diff = np.abs(s0 * n1 - s1 * n0)
        ks_num = int(diff.max())
        ks_at = int(df["v"].to_numpy()[diff == ks_num].min())
        return pd.DataFrame({
            "n_ref": np.array([n0], dtype="int64"),
            "n_other": np.array([n1], dtype="int64"),
            "ks_num": np.array([ks_num], dtype="int64"),
            "ks_at": np.array([ks_at], dtype="int64"),
            "ks_stat": [ks_num / (n0 * n1)],
        })

    return hist.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )
