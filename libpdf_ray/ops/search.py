"""Full-text search operators: BM25 ranked retrieval and inverted-index
posting lists over the ``documents`` corpus.

The missing half of a training-data platform next to dedup/quality
(:mod:`.dedup`, :mod:`.text`) and ANN (:mod:`.similarity`): keyword search
for corpus exploration, decontamination audits ("which documents mention
this benchmark?") and boolean pre-filters feeding the embedding stages.

Scale shapes:

- :func:`bm25_search` — ONE streaming pass over the corpus.  Each batch
  emits (a) a one-row partial with the corpus statistics BM25 needs
  (document count, total token length, per-query-term document
  frequencies) and (b) a compact hits table (doc_id, doc length, one tf
  column per query term) for documents containing at least one query term.
  The stats rows reduce to scalars (bytes — a legitimate driver collect);
  the hits table is then scored in-stream against the broadcast stats and
  top-k reduced with the shared tree merge.  The corpus text itself is
  read once and never shuffled; only hits rows (a handful of int64s per
  matching doc) enter the object store.
- :func:`posting_lists` — the classic inverted-index build: per-batch
  distinct (term, doc_id) pairs (each document contributes each term once
  regardless of occurrences), a single hash shuffle on ``term``, and a
  per-term sorted doc-id aggregation.  Emitting the posting as a sorted
  CSV string keeps the row Arrow-scalar (and hash-comparable against a
  SQL ``STRING_AGG`` oracle); a real deployment would write
  ``list<int64>`` postings to partitioned parquet the same way.

Exactness: BM25's textbook idf uses ``ln`` — float transcendentals whose
last-ulp behavior differs across engines.  To keep the operator
hash-checkable we use the *raw-odds* idf variant ``(N - df + ½)/(df + ½)``
(the argument of Robertson's log, monotone in it, so rankings for a fixed
corpus agree) and clear denominators: with k1 = 6/5, b = 3/4 and
avgdl = L/N the per-term score reduces to the integer ratio

    score_t = 22·L·tf·(2N − 2·df + 1)  /  ((10·L·tf + 3·L + 9·dl·N)·(2·df + 1))

computed as ONE double division of identical int64 operands on both the
engine and the SQL side, then summed over query terms in fixed term order
— bit-identical doubles, no rounding tolerance needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .corpus import tokenize_series
from .util import combine_partials, read_sized, topk

#: BM25 shape parameters as exact rationals: k1 = K1_NUM/K1_DEN = 1.2,
#: b = 3/4 (folded into the integer score formula above).
K1 = 1.2
B = 0.75


def _term_stats_and_hits(df: pd.DataFrame, terms: list) -> pd.DataFrame:
    """One batch → stats partial row (kind=0) + hits rows (kind=1).

    Columns: kind, doc_id, dl (doc token length), tf_<i> per query term.
    The stats row carries n_docs in ``doc_id``, total length in ``dl`` and
    per-term document frequencies in the tf columns.
    """
    toks = tokenize_series(df["text"])
    dl = toks.str.len().to_numpy(dtype=np.int64)
    tf_cols = {}
    df_counts = []
    for i, t in enumerate(terms):
        tf = toks.map(lambda ts, t=t: ts.count(t)).to_numpy(dtype=np.int64)
        tf_cols[f"tf_{i}"] = tf
        df_counts.append(int((tf > 0).sum()))
    hit_mask = np.zeros(len(df), dtype=bool)
    for c in tf_cols.values():
        hit_mask |= c > 0
    hits = pd.DataFrame(
        {
            "kind": np.ones(int(hit_mask.sum()), dtype="int64"),
            "doc_id": df["doc_id"].to_numpy()[hit_mask],
            "dl": dl[hit_mask],
            **{k: v[hit_mask] for k, v in tf_cols.items()},
        }
    )
    stats = pd.DataFrame(
        {
            "kind": np.array([0], dtype="int64"),
            "doc_id": np.array([len(df)], dtype="int64"),
            "dl": np.array([int(dl.sum())], dtype="int64"),
            **{
                f"tf_{i}": np.array([c], dtype="int64")
                for i, c in enumerate(df_counts)
            },
        }
    )
    return pd.concat([stats, hits], ignore_index=True)


def bm25_search(docs, terms: list, k: int = 20):
    """Top-``k`` documents by BM25 score for the fixed query ``terms``.

    ``docs``: Dataset of (doc_id, text).  Returns (doc_id, score) with the
    exact integer-ratio scoring documented in the module docstring, ties
    broken by ascending doc_id.
    """
    import ray

    mixed = docs.map_batches(
        _term_stats_and_hits, fn_kwargs={"terms": terms}, batch_format="pandas"
    ).materialize()
    # corpus stats: one tiny row per input block — scalars, driver-safe
    stats = (
        mixed.map_batches(
            lambda df: df[df["kind"] == 0], batch_format="pandas"
        )
        .to_pandas()
        .drop(columns=["kind"])
        .sum()
    )
    n_docs = int(stats["doc_id"])
    total_len = int(stats["dl"])
    dfs = [int(stats[f"tf_{i}"]) for i in range(len(terms))]
    ref = ray.put((n_docs, total_len, dfs))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["kind"] == 1]
        n, L, dfv = ray.get(ref)
        # operand magnitude check: the int64 products below are exact (and
        # bit-identical to the SQL oracle's) while BOTH the numerator
        # 22·L·tf·(2n−2df+1) AND the denominator (10·L·tf+3·L+9·dl·n)·(2df+1)
        # stay < 2^62 — the denominator matters independently because a
        # document ~5× average length can overflow it while the numerator
        # bound still holds (numpy would wrap silently).  Computed in python
        # bigints against the batch maxima, so the check itself cannot wrap.
        # A corpus large enough to breach the bound (L·n ≳ 10^17) loses
        # hash-exactness but not correctness — scores degrade to ordinary
        # float evaluation of the same ratio.
        max_tf = int(
            batch[[f"tf_{i}" for i in range(len(dfv))]].to_numpy().max(initial=1)
        )
        max_dl = int(batch["dl"].max()) if len(batch) else 1
        num_bound = 22 * L * max_tf * (2 * n + 1)
        den_bound = (10 * L * max_tf + 3 * L + 9 * max_dl * n) * (2 * n + 1)
        exact = max(num_bound, den_bound) < (1 << 62)
        cast = np.int64 if exact else np.float64
        dl = batch["dl"].to_numpy(dtype=np.int64)
        total = np.zeros(len(batch), dtype=np.float64)
        # fixed term order: bit-identical summation on the SQL side
        for i in range(len(dfv)):
            tf = batch[f"tf_{i}"].to_numpy(dtype=np.int64)
            num = (cast(22) * cast(L)) * tf.astype(cast) * cast(2 * n - 2 * dfv[i] + 1)
            den = (
                cast(10) * cast(L) * tf.astype(cast)
                + cast(3) * cast(L)
                + cast(9) * dl.astype(cast) * cast(n)
            ) * cast(2 * dfv[i] + 1)
            total = total + num / den
        return pd.DataFrame({"doc_id": batch["doc_id"], "score": total})

    scored = mixed.map_batches(score, batch_format="pandas")
    return topk(scored, ["score", "doc_id"], [True, False], k)


def q_bm25_search(sf_dir: str):
    docs = read_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_search(docs, terms=["spark", "hash", "window", "vector"])


def posting_lists(docs, est_terms: int):
    """Inverted index: (term, df, postings) with postings = sorted
    comma-joined doc ids.

    Per-batch distinct (term, doc_id) pairs → one term-keyed combine
    (cardinality-routed like every combine in this engine) → per-term
    sort + join.  At web scale each posting row would be written as a
    ``list<int64>`` parquet cell partitioned by term hash; the CSV form
    here keeps the result hash-checkable against ``STRING_AGG``.
    """

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        toks = tokenize_series(df["text"]).map(lambda ts: sorted(set(ts)))
        counts = toks.str.len().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "term": np.fromiter(
                    chain.from_iterable(toks), dtype=object, count=int(counts.sum())
                ),
                "doc_id": np.repeat(
                    df["doc_id"].to_numpy(), counts
                ).astype("int64"),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["term", "doc_id"])

    pair_ds = combine_partials(
        docs.map_batches(pairs, batch_format="pandas"),
        merge,
        ["term", "doc_id"],
        est_keys=est_terms,
        merge_fn=merge,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "term": [g["term"].iloc[0]],
                "df": np.array([len(ids)], dtype="int64"),
                "postings": [",".join(str(i) for i in ids)],
            }
        )

    from .util import shuffle_partitions

    return pair_ds.groupby(
        "term", num_partitions=shuffle_partitions(est_keys=est_terms)
    ).map_groups(fold, batch_format="pandas")


def q_posting_lists(sf_dir: str):
    from .util import parquet_row_count

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])
    # ~16 distinct (term, doc) pairs per doc routes big corpora bucketed
    return posting_lists(docs, est_terms=max(64, parquet_row_count(path) * 16))


# ---- TF-IDF keyword extraction ------------------------------------------
#: integer idf scale: idf_scaled = (N_docs * SCALE) // df — exact in int64
#: up to N·SCALE ≈ 9·10^18 (at 10^12 docs shrink SCALE or move the oracle
#: to HUGEINT; the ordering is unchanged for any fixed scale)
TFIDF_IDF_SCALE = 1_000_000


def _corpus_df(docs, est_docs: int):
    """Full corpus document-frequency table (term, df) — the vocab_stats
    partial/combine WITHOUT the top-k cut (keyword extraction needs every
    term's df, not just the head)."""
    from .corpus import _explode_tokens

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        if not len(ex):
            return pd.DataFrame({"term": [], "df": []}).astype(
                {"term": object, "df": "int64"}
            )
        g = ex.groupby("term", as_index=False).agg(df=("doc_id", "nunique"))
        return g.astype({"df": "int64"})

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False)["df"].sum()

    return combine_partials(
        docs.map_batches(partial, batch_format="pandas"),
        red, ["term"], est_keys=max(64, est_docs * 16), merge_fn=red,
    )


def _rank_topk(scored: pd.DataFrame, k: int) -> pd.DataFrame:
    """(doc_id, term, tf, df, score) → per-doc top-k with 1-based rank,
    ordered by score DESC then term ASC (a total order: terms are
    distinct within a document)."""
    scored = scored.sort_values(
        ["doc_id", "score", "term"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    rank = scored.groupby("doc_id", sort=False).cumcount() + 1
    out = scored[rank <= k].assign(rank=rank[rank <= k])
    return out[["doc_id", "rank", "term", "tf", "df", "score"]].astype(
        {"doc_id": "int64", "rank": "int64", "tf": "int64",
         "df": "int64", "score": "int64"}
    )


def tfidf_topk(docs, n_docs: int, est_docs: int, k: int = 3,
               vocab_limit: int | None = None):
    """Per-document keyword extraction: each document's top-``k`` terms by
    TF-IDF with the integer-exact idf ``(N · SCALE) // df`` (score =
    tf · idf_scaled; ties broken by term — engine and SQL oracle agree
    bit-for-bit, no float log).

    Scale shape — a feature-weighting join, routed by vocabulary size:

    - vocabulary ≤ :data:`~.util.BROADCAST_LOOKUP_ROW_LIMIT`: the corpus
      DF table (one vocab_stats-shaped pass) is broadcast once via
      ``ray.put`` as two sorted numpy arrays; a SECOND corpus pass
      computes per-doc term counts, maps df by ``np.searchsorted``,
      scores, and takes the per-doc top-k BATCH-LOCALLY (a document
      never spans blocks) — zero data shuffles.
    - larger vocabularies: no driver materialization — the exploded
      (doc_id, term, tf) pairs and the DF table meet in ONE term-hashed
      tagged-union co-group (`_cogrouped`), and the scored pairs regroup
      by doc for the top-k in a second bucketed pass.  Only scalar
      (id, term, int) rows transit either shuffle.

    Route equality is pinned in tests/test_search.py.

    ``vocab_limit`` overrides the broadcast threshold (tests force the
    distributed route on small corpora with ``vocab_limit=0``)."""
    import ray

    from .corpus import _explode_tokens
    from .util import BROADCAST_LOOKUP_ROW_LIMIT

    if vocab_limit is None:
        vocab_limit = BROADCAST_LOOKUP_ROW_LIMIT

    # the DF table is consumed twice (count for routing, then either the
    # driver collect or the join side) — materialize the compacted vocab
    # once; it is orders of magnitude smaller than the corpus
    df_tbl = _corpus_df(docs, est_docs).materialize()
    n_terms = df_tbl.count()

    def tf_frame(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_tokens(df)
        if not len(ex):
            return pd.DataFrame({"doc_id": [], "term": [], "tf": []}).astype(
                {"doc_id": "int64", "term": object, "tf": "int64"}
            )
        g = ex.groupby(["doc_id", "term"], as_index=False, sort=False).agg(
            tf=("term", "size")
        )
        return g.astype({"doc_id": "int64", "tf": "int64"})

    if n_terms <= vocab_limit:
        vocab = df_tbl.to_pandas().sort_values("term")
        bcast = ray.put(
            (vocab["term"].to_numpy(dtype=object),
             vocab["df"].to_numpy(dtype=np.int64))
        )

        def score_local(df: pd.DataFrame) -> pd.DataFrame:
            tf = tf_frame(df)
            if not len(tf):
                return _rank_topk(tf.assign(df=[], score=[]), k)
            terms, dfs = ray.get(bcast)
            idx = np.searchsorted(terms, tf["term"].to_numpy())
            dfv = dfs[idx]
            idf = (np.int64(n_docs) * np.int64(TFIDF_IDF_SCALE)) // dfv
            return _rank_topk(
                tf.assign(df=dfv, score=tf["tf"].to_numpy() * idf), k
            )

        return docs.map_batches(score_local, batch_format="pandas")

    # large-vocab route: term-hashed co-group join, then doc-keyed top-k
    from .relational import _bucketed_groups, _cogrouped
    from .util import shuffle_partitions

    def hash_terms(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _th=pd.util.hash_pandas_object(
                df["term"], index=False
            ).astype("int64").abs()
        )

    left = df_tbl.map_batches(hash_terms, batch_format="pandas").map_batches(
        lambda d: d.assign(doc_id=np.int64(-1), tf=np.int64(0)),
        batch_format="pandas",
    )
    right = docs.map_batches(tf_frame, batch_format="pandas").map_batches(
        lambda d: hash_terms(d).assign(df=np.int64(0)),
        batch_format="pandas",
    )
    cols = ["doc_id", "term", "tf", "df", "_th"]
    tagged = left.select_columns(cols).union(right.select_columns(cols))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dfs = g[g["doc_id"] < 0][["term", "df"]]
        tfs = g[g["doc_id"] >= 0][["doc_id", "term", "tf"]]
        m = tfs.merge(dfs, on="term", how="inner")
        idf = (np.int64(n_docs) * np.int64(TFIDF_IDF_SCALE)) // \
            m["df"].to_numpy(dtype=np.int64)
        return m.assign(score=m["tf"].to_numpy() * idf)

    scored = _cogrouped(
        tagged.map_batches(
            lambda d: d.rename(columns={"_th": "key"}), batch_format="pandas"
        ),
        "key",
        lambda g: merge_bucket(g.drop(columns=["key"])),
        num_buckets=shuffle_partitions(est_keys=n_terms),
    )

    return _bucketed_groups(
        scored, "doc_id",
        shuffle_partitions(est_keys=est_docs),
        lambda g: _rank_topk(g, k),
    )


def q_tfidf_topk(sf_dir: str):
    from .util import parquet_row_count

    path = f"{sf_dir}/documents.parquet"
    docs = read_sized(path, columns=["doc_id", "text"])
    n = parquet_row_count(path)
    return tfidf_topk(docs, n_docs=n, est_docs=n)
