"""Unit tests for ops/search.py (BM25, posting lists) and the outer-join
zero path of q_customer_order_counts (the sf0.001 oracle data has no
zero-order customer, so the fillna(0) branch needs synthetic coverage)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_docs_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("docs")
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype="int64"),
            "text": [
                "spark spark spark engine",          # tf-heavy for 'spark'
                "hash join hash join hash",          # tf-heavy for 'hash'
                "window functions are windowed",     # one 'window'
                "vector search with one vector hit vector",
                "nothing relevant here at all",      # no query term
                "spark hash window vector",          # all four, short doc
            ],
        }
    )
    p = str(out / "documents.parquet")
    df.to_parquet(p)
    return str(out)


def test_bm25_ranking_and_tiebreak(ray_session, tiny_docs_dir):
    from libpdf_ray.ops.search import bm25_search, q_bm25_search
    from libpdf_ray.ops.util import read_sized

    docs = read_sized(
        f"{tiny_docs_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    res = (
        bm25_search(docs, terms=["spark", "hash", "window", "vector"], k=10)
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    # doc 4 has no query term → excluded from hits
    assert 4 not in set(res["doc_id"])
    assert len(res) == 5
    # the all-terms short doc must beat every single-term doc
    assert res["doc_id"].iloc[0] == 5
    # every score positive, strictly ordered output
    assert (res["score"] > 0).all()
    assert (np.diff(res["score"].to_numpy()) <= 0).all()


def test_bm25_score_formula_exact(ray_session, tiny_docs_dir):
    """Engine scores equal a direct single-process evaluation of the exact
    integer-ratio formula (module-docstring contract)."""
    import re

    from libpdf_ray.ops.search import bm25_search
    from libpdf_ray.ops.util import read_sized

    terms = ["spark", "hash"]
    df = pd.read_parquet(f"{tiny_docs_dir}/documents.parquet")
    toks = [
        [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for s in df["text"]
    ]
    n = len(df)
    L = sum(len(ts) for ts in toks)
    dfs = [sum(1 for ts in toks if q in ts) for q in terms]
    expected = {}
    for did, ts in zip(df["doc_id"], toks):
        dl = len(ts)
        score = 0.0
        for q, dfq in zip(terms, dfs):
            tf = ts.count(q)
            num = 22 * L * tf * (2 * n - 2 * dfq + 1)
            den = (10 * L * tf + 3 * L + 9 * dl * n) * (2 * dfq + 1)
            score = score + num / den
        if any(ts.count(q) for q in terms):
            expected[int(did)] = score
    docs = read_sized(
        f"{tiny_docs_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    got = bm25_search(docs, terms=terms, k=10).to_pandas()
    assert len(got) == len(expected)
    for did, sc in zip(got["doc_id"], got["score"]):
        assert expected[int(did)] == sc  # bit-identical


def test_posting_lists_tiny(ray_session, tiny_docs_dir):
    from libpdf_ray.ops.search import q_posting_lists

    res = q_posting_lists(tiny_docs_dir).to_pandas().set_index("term")
    assert res.loc["spark", "postings"] == "0,5"
    assert res.loc["spark", "df"] == 2
    assert res.loc["vector", "postings"] == "3,5"
    # each doc contributes a term once regardless of occurrences
    assert res.loc["hash", "df"] == 2


def test_customer_order_counts_zero_path(ray_session, tmp_path):
    """Customers with no qualifying order keep n_orders=0/total_spent=0.0."""
    from libpdf_ray.ops.relational import q_customer_order_counts

    pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], dtype="int64"),
            "c_name": ["a", "b", "c"],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame(
        {
            "o_custkey": np.array([1, 1, 3], dtype="int64"),
            "o_totalprice": [10.5, 2.25, 7.0],
            "o_orderdate": pd.to_datetime(
                ["1998-05-01", "1999-01-01", "1997-01-01"]
            ),
        }
    ).to_parquet(tmp_path / "orders.parquet")
    res = (
        q_customer_order_counts(str(tmp_path))
        .to_pandas()
        .set_index("c_custkey")
        .sort_index()
    )
    assert res.loc[1, "n_orders"] == 2 and res.loc[1, "total_spent"] == 12.75
    # customer 3's only order predates the cutoff → outer-join zero row
    assert res.loc[3, "n_orders"] == 0 and res.loc[3, "total_spent"] == 0.0
    assert res.loc[2, "n_orders"] == 0
    assert len(res) == 3


def test_source_sample_block_invariance(ray_session, tmp_path):
    """The min-N-hash reservoir must be invariant to how the corpus is
    split into blocks (combiner associativity under forced multi-block)."""
    import ray.data as rd

    from libpdf_ray.ops.corpus import _HASH_MOD, _HASH_MULT, q_source_sample

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype="int64"),
            "text": ["x"] * 400,
            "lang": ["en"] * 400,
            "n_chars": np.ones(400, dtype="int64"),
            "source": [f"s{i % 7}" for i in rng.permutation(400)],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    got = (
        q_source_sample(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    # reference: single-process over the same hash
    h = (df["doc_id"].to_numpy(np.uint64) * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
    ref = (
        df.assign(h=h.astype("int64"))
        .sort_values(["source", "h", "doc_id"])
        .groupby("source")
        .head(3)[["source", "doc_id"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)
    # force many small blocks through the same operator
    ds = rd.read_parquet(str(tmp_path / "documents.parquet")).repartition(16)
    from libpdf_ray.ops.corpus import q_source_sample as _  # noqa: F401
    from libpdf_ray.ops.search import bm25_search

    # bm25 over 16 blocks must match bm25 over 1 block bit-for-bit
    one = bm25_search(
        rd.read_parquet(str(tmp_path / "documents.parquet")).repartition(1)
        .map_batches(lambda d: d[["doc_id", "text"]], batch_format="pandas"),
        terms=["x"], k=5,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    many = bm25_search(
        ds.map_batches(lambda d: d[["doc_id", "text"]], batch_format="pandas"),
        terms=["x"], k=5,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)


def test_tfidf_topk_semantics_and_routes(ray_session, tiny_docs_dir):
    """tfidf_topk: (a) broadcast route matches a single-process numpy
    reference of the integer idf formula, (b) the distributed co-group
    route (forced with vocab_limit=0) is bit-identical, (c) block count
    does not change the answer."""
    import re

    import ray.data as rd

    from libpdf_ray.ops.search import TFIDF_IDF_SCALE, tfidf_topk
    from libpdf_ray.ops.util import read_sized

    path = f"{tiny_docs_dir}/documents.parquet"
    src = pd.read_parquet(path)
    n_docs = len(src)

    # single-process reference
    rows = []
    df_count: dict = {}
    per_doc: list = []
    for _, r in src.iterrows():
        toks = [t for t in re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
        tf: dict = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        per_doc.append((int(r["doc_id"]), tf))
        for t in tf:
            df_count[t] = df_count.get(t, 0) + 1
    for doc_id, tf in per_doc:
        scored = sorted(
            (
                (
                    -(tf[t] * ((n_docs * TFIDF_IDF_SCALE) // df_count[t])),
                    t,
                )
                for t in tf
            )
        )
        for rank, (neg, t) in enumerate(scored[:3], start=1):
            rows.append(
                (doc_id, rank, t, tf[t], df_count[t], -neg)
            )
    ref = pd.DataFrame(
        rows, columns=["doc_id", "rank", "term", "tf", "df", "score"]
    ).sort_values(["doc_id", "rank"]).reset_index(drop=True)

    def run(**kw):
        docs = read_sized(path, columns=["doc_id", "text"])
        return (
            tfidf_topk(docs, n_docs=n_docs, est_docs=n_docs, **kw)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )

    broadcast = run()
    assert broadcast.equals(ref)

    distributed = run(vocab_limit=0)
    assert distributed.equals(ref)

    # block-count invariance on the broadcast route
    many = (
        tfidf_topk(
            rd.read_parquet(path).repartition(6)
            .map_batches(lambda d: d[["doc_id", "text"]],
                         batch_format="pandas"),
            n_docs=n_docs, est_docs=n_docs,
        )
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert many.equals(ref)
