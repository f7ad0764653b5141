"""Unit tests for the corpus-curation operators (ops/corpus.py).

DuckDB-oracle parity at sf0.001 is covered in test_oracle_parity.py; these
pin the kernel semantics on hand-built inputs where the expected output is
computable by eye (or by a trivial pure-Python reference)."""

import numpy as np
import pandas as pd
import pytest

from libpdf_ray.ops.corpus import (
    SAMPLE_BASE_THRESHOLD,
    SAMPLE_BOOST_SOURCES,
    SAMPLE_BOOST_THRESHOLD,
    _shingle_set,
    customers_no_orders,
    decontaminate,
    hash_sample,
    repetition_stats,
    tokenize_series,
    vocab_stats,
)


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


class TestTokenizer:
    def test_duckdb_parity_tokens(self):
        import duckdb

        texts = [
            "Hello, World! 42",
            "  mixed CASE and ümlauts über  ",
            "",
            "a-b_c.d",
        ]
        got = tokenize_series(pd.Series(texts)).tolist()
        exp = duckdb.sql(
            "SELECT list_filter(regexp_split_to_array(lower(t), '[^a-z0-9]+'),"
            " x -> x <> '') FROM (SELECT unnest(?) AS t)",
            params=[texts],
        ).fetchall()
        assert got == [row[0] for row in exp]

    def test_shingles(self):
        assert _shingle_set(["a", "b", "c", "d"], 4) == {"a b c d"}
        assert _shingle_set(["a", "b", "c"], 4) == set()
        assert _shingle_set(list("abcde"), 4) == {"a b c d", "b c d e"}


class TestVocabStats:
    def test_counts(self, ray_session):
        docs = _ds(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": ["the cat the dog", "the cat", "bird"],
                }
            )
        )
        out = (
            vocab_stats(docs, est_docs=3, k=10)
            .to_pandas()
            .set_index("term")
            .sort_index()
        )
        assert out.loc["the", "tf"] == 3 and out.loc["the", "df"] == 2
        assert out.loc["cat", "tf"] == 2 and out.loc["cat", "df"] == 2
        assert out.loc["bird", "df"] == 1

    def test_topk_cut_is_deterministic(self, ray_session):
        # 4 terms tied at tf=1 → k=2 keeps the lexicographically first two
        docs = _ds(pd.DataFrame({"doc_id": [1], "text": ["d c b a"]}))
        out = vocab_stats(docs, est_docs=1, k=2).to_pandas()
        assert sorted(out["term"]) == ["a", "b"]


class TestRepetitionStats:
    def test_metrics(self, ray_session):
        docs = _ds(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3],
                    "text": ["a a a b", "x y z", "   "],
                }
            )
        )
        out = repetition_stats(docs).to_pandas().set_index("doc_id")
        assert 3 not in out.index  # zero-token doc dropped
        assert out.loc[1, "n_tokens"] == 4
        assert out.loc[1, "n_distinct"] == 2
        assert out.loc[1, "max_tf"] == 3
        assert out.loc[1, "dup_frac"] == pytest.approx(0.5)
        assert out.loc[2, "dup_frac"] == 0.0


class TestHashSample:
    def test_matches_scalar_hash(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(1000, dtype=np.int64),
                "lang": "en",
                "source": ["src0" if i % 2 else "src9" for i in range(1000)],
            }
        )
        kept = set(hash_sample(_ds(df)).to_pandas()["doc_id"])
        for _, row in df.iterrows():
            thr = (
                SAMPLE_BOOST_THRESHOLD
                if row["source"] in SAMPLE_BOOST_SOURCES
                else SAMPLE_BASE_THRESHOLD
            )
            expect = (int(row["doc_id"]) * 2654435761) % (1 << 32) < thr
            assert (row["doc_id"] in kept) == expect

    def test_uint64_wrap_is_congruent(self):
        # ids beyond 2^33: numpy uint64 wrap must equal exact integer math
        ids = np.array([2**40 + 7, 2**52 + 123456789], dtype=np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        for i, v in enumerate([2**40 + 7, 2**52 + 123456789]):
            assert int(h[i]) == (v * 2654435761) % (1 << 32)


class TestDecontaminate:
    def test_flags_only_real_overlap(self, ray_session):
        corpus = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 97],
                "text": [
                    "alpha beta gamma delta epsilon",  # shares 4-gram w/ bench
                    "one two three four five",  # no overlap
                    "beta gamma delta epsilon zeta",  # shares shifted 4-gram
                    "alpha beta gamma delta",  # the benchmark doc itself
                ],
            }
        )
        bench = corpus[corpus["doc_id"] == 97]
        out = (
            decontaminate(_ds(corpus), _ds(bench), n=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert set(out.index) == {1}  # doc 3 shares no 4-gram with bench
        assert out.loc[1, "n_hits"] == 1

    def test_benchmark_doc_never_flagged(self, ray_session):
        corpus = pd.DataFrame(
            {"doc_id": [97, 5], "text": ["a b c d e", "a b c d e"]}
        )
        bench = corpus[corpus["doc_id"] == 97]
        out = decontaminate(_ds(corpus), _ds(bench), n=4).to_pandas()
        assert set(out["doc_id"]) == {5}

    def test_broadcast_guard(self, ray_session, monkeypatch):
        import libpdf_ray.ops.corpus as C

        monkeypatch.setattr(C, "BROADCAST_LOOKUP_ROW_LIMIT", 1)
        corpus = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "e f g h"]})
        with pytest.raises(ValueError, match="too large to broadcast"):
            decontaminate(_ds(corpus), _ds(corpus), n=4)


class TestMedianSelection:
    def test_rank_semantics_match_percentile_disc(self, ray_session):
        """ceil(n/2) selection over the histogram == percentile_disc(0.5)
        for even and odd group sizes (DuckDB cross-checked in
        test_oracle_parity; this pins the rank arithmetic directly)."""
        import duckdb

        from libpdf_ray.ops.relational import q_median_order_price

        got = (
            q_median_order_price("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("o_orderpriority")
            .sort_index()
        )
        exp = duckdb.sql(
            "SELECT o_orderpriority, percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS m "
            "FROM read_parquet('/root/testdata/sf0.001/orders.parquet') "
            "GROUP BY 1"
        ).df().set_index("o_orderpriority").sort_index()
        assert (got["median_price"] == exp["m"]).all()


class TestAntiJoin:
    def test_matches_pandas_reference(self, ray_session):
        rng = np.random.RandomState(7)
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(200, dtype=np.int64),
                "c_name": [f"c{i}" for i in range(200)],
                "c_acctbal": rng.uniform(0, 1000, 200).round(2),
            }
        )
        orders = pd.DataFrame(
            {
                "o_custkey": rng.choice(200, 500).astype(np.int64),
                "o_orderdate": pd.to_datetime(
                    rng.choice(["1999-06-01", "2000-06-01"], 500)
                ),
            }
        )
        got = (
            customers_no_orders(_ds(cust), _ds(orders), est_keys=200, k=10)
            .to_pandas()
            .reset_index(drop=True)
        )
        recent = set(
            orders.loc[orders["o_orderdate"] >= "2000-01-01", "o_custkey"]
        )
        exp = (
            cust[~cust["c_custkey"].isin(recent)]
            .sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
            .head(10)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["c_custkey", "c_name", "c_acctbal"]],
            exp[["c_custkey", "c_name", "c_acctbal"]],
        )


class TestKMeans:
    def test_matches_single_process_lloyd(self, ray_session):
        """Distributed Lloyd with a fixed init == pure-numpy Lloyd up to
        float-association noise."""
        import ray.data as rd

        from libpdf_ray.ops.similarity import kmeans_fit

        rng = np.random.RandomState(3)
        # three separated blobs on the sphere
        base = rng.normal(size=(3, 16))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        x = np.repeat(base, 40, axis=0) + rng.normal(scale=0.05, size=(120, 16))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        init = x[[0, 40, 80]]
        df = pd.DataFrame({"embedding": [row.tolist() for row in x]})
        fit = kmeans_fit(
            rd.from_pandas(df).repartition(6), n_clusters=3, iters=4, init=init
        )

        c = init / np.linalg.norm(init, axis=1, keepdims=True)
        for _ in range(4):
            assign = np.argmax(x @ c.T, axis=1)
            nc = c.copy()
            for j in range(3):
                m = x[assign == j]
                if len(m):
                    v = m.sum(axis=0)
                    nc[j] = v / np.linalg.norm(v)
            c = nc
        assert np.allclose(fit["centroids"], c, atol=1e-9)
        assert fit["n"] == 120
        # spherical Lloyd: mean cosine to assigned centroid must not decrease
        assert all(
            b >= a - 1e-12 for a, b in zip(fit["inertia"], fit["inertia"][1:])
        )

    def test_each_blob_gets_a_centroid(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.similarity import kmeans_fit

        rng = np.random.RandomState(9)
        base = rng.normal(size=(4, 8))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        x = np.repeat(base, 25, axis=0) + rng.normal(scale=0.02, size=(100, 8))
        df = pd.DataFrame({"embedding": [row.tolist() for row in x]})
        fit = kmeans_fit(rd.from_pandas(df), n_clusters=4, iters=6, seed=1)
        # every blob center has a learned centroid at cosine > 0.95
        sims = (base / np.linalg.norm(base, axis=1, keepdims=True)) @ fit[
            "centroids"
        ].T
        assert (sims.max(axis=1) > 0.95).all()


class TestSampleOverlapAntiJoin:
    def test_fallback_matches_broadcast_path(self, ray_session, monkeypatch):
        """Forcing the contaminated-set size guard to trip must route
        q_sample_overlap through the bucketed anti-join and produce the
        exact same kept set as the broadcast fast path."""
        import libpdf_ray.ops.corpus as C

        sf = "/root/testdata/sf0.001"
        fast = (
            C.q_sample_overlap(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # limit 6: decontaminate's 6-doc benchmark broadcast still fits,
        # but the 8-doc contaminated set trips the guard → anti-join path
        monkeypatch.setattr(C, "BROADCAST_LOOKUP_ROW_LIMIT", 6)
        slow = (
            C.q_sample_overlap(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(fast) > 0  # fixture keeps the query non-degenerate
        pd.testing.assert_frame_equal(fast, slow)


class TestPackSequences:
    """q_pack_sequences: the distributed ordered prefix-scan must agree
    with a single-pass numpy reference, on BOTH plan routes, including
    sparse doc_ids and bins that straddle bucket boundaries."""

    @staticmethod
    def _write_docs(tmp_path, doc_ids, n_chars):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    @staticmethod
    def _reference(doc_ids, n_chars, budget):
        order = np.argsort(doc_ids, kind="stable")
        ids = np.asarray(doc_ids)[order]
        nc = np.asarray(n_chars)[order]
        start = np.concatenate(([0], np.cumsum(nc)[:-1]))
        bins = start // budget
        rows = {}
        for b, d, c in zip(bins, ids, nc):
            r = rows.setdefault(int(b), [0, 0, int(d), int(d)])
            r[0] += 1
            r[1] += int(c)
            r[2] = min(r[2], int(d))
            r[3] = max(r[3], int(d))
        return pd.DataFrame(
            [
                {"bin": b, "n_docs": v[0], "total_chars": v[1],
                 "first_doc": v[2], "last_doc": v[3]}
                for b, v in sorted(rows.items())
            ]
        )

    def test_multi_bucket_distributed_route(self, ray_session, tmp_path,
                                            monkeypatch):
        import libpdf_ray.ops.relational as R
        from libpdf_ray.ops.corpus import q_pack_sequences

        # force the bucket shuffle (not the single coalesced task)
        monkeypatch.setattr(R, "SINGLE_TASK_GROUP_BYTES", 0)
        rng = np.random.RandomState(11)
        # SPARSE ids: gaps + a huge outlier id → empty coarse buckets
        doc_ids = np.unique(rng.randint(0, 5000, size=400))
        doc_ids[-1] = 10_000_000
        n_chars = rng.randint(0, 900, size=len(doc_ids))
        sf = self._write_docs(tmp_path, doc_ids, n_chars)
        # width 64 → many buckets; budget 1000 → bins straddle buckets
        got = (
            q_pack_sequences(sf, budget=1000, bucket_width=64)
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        exp = self._reference(doc_ids, n_chars, 1000)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_single_task_route_identical(self, ray_session, tmp_path):
        from libpdf_ray.ops.corpus import q_pack_sequences

        rng = np.random.RandomState(12)
        doc_ids = np.arange(300)
        n_chars = rng.randint(1, 500, size=300)
        sf = self._write_docs(tmp_path, doc_ids, n_chars)
        got = (
            q_pack_sequences(sf, budget=2048, bucket_width=50)
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        exp = self._reference(doc_ids, n_chars, 2048)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestCollocations:
    """collocations: integer-PMI ranking is exact vs a single-process
    reference, invariant to block count, and handles the repeated-word
    bigram ('x x') and the min_count floor."""

    def test_exact_vs_reference_many_blocks(self, ray_session):
        import ray.data as rd
        from collections import Counter

        from libpdf_ray.ops.corpus import (
            COLLOC_SCALE,
            collocations,
            tokenize_series,
        )

        rng = np.random.default_rng(11)
        vocab = ["data", "engine", "ray", "shuffle", "batch", "arrow",
                 "span", "table", "x"]
        rows = []
        for d in range(60):
            toks = list(rng.choice(vocab, size=40))
            toks += ["ray", "data"] * 3 + ["x", "x"] * 2   # planted pairs
            rows.append({"doc_id": d, "text": " ".join(toks)})

        got = collocations(
            rd.from_items(rows).repartition(12), est_docs=60,
            k=10, min_count=5,
        )
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        got = got.sort_values(["score", "gram"],
                              ascending=[False, True]).reset_index(drop=True)

        uni: Counter = Counter()
        big: Counter = Counter()
        for r in rows:
            ts = tokenize_series(pd.Series([r["text"]])).iloc[0]
            uni.update(ts)
            big.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        n = sum(uni.values())
        cand = [
            (g, c) for g, c in big.items() if c >= 5
        ]
        scored = [
            (g, c, uni[g.split()[0]], uni[g.split()[1]],
             (c * n * COLLOC_SCALE)
             // (uni[g.split()[0]] * uni[g.split()[1]]))
            for g, c in cand
        ]
        scored.sort(key=lambda t: (-t[4], t[0]))
        want = pd.DataFrame(
            scored[:10], columns=["gram", "c_xy", "c_x", "c_y", "score"]
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert "ray data" in set(got["gram"])
        assert "x x" in set(got["gram"])

        # single-task route (est_bytes under the threshold) is identical
        small = collocations(
            rd.from_items(rows).repartition(12), est_docs=60,
            k=10, min_count=5, est_bytes=1,
        )
        small = small.to_pandas() if hasattr(small, "to_pandas") else small
        small = small.sort_values(
            ["score", "gram"], ascending=[False, True]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(small, want, check_dtype=False)


class TestTrainSplit:
    """train_split: the 80/10/10 hash-ring assignment is deterministic,
    exhaustive, and matches a single-process evaluation of the exact
    integer hash (including ids past 2^33, where int64 multiply would
    overflow)."""

    def test_assignment_exact_and_exhaustive(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.corpus import (
            _HASH_MOD,
            _HASH_MULT,
            SPLIT_TRAIN_UPPER,
            SPLIT_VAL_UPPER,
            train_split,
        )

        ids = list(range(500)) + [2**33 + 7, 2**40 + 1, 2**62]
        ds = rd.from_items(
            [{"doc_id": i, "n_chars": 10} for i in ids]
        ).repartition(8)
        got = train_split(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

        def ref(i):
            h = (i * _HASH_MULT) % _HASH_MOD
            if h < SPLIT_TRAIN_UPPER:
                return "train"
            return "val" if h < SPLIT_VAL_UPPER else "test"

        assert got["split"].tolist() == [ref(i) for i in sorted(ids)]
        # all three splits occur on 500 uniform ids
        assert set(got["split"]) == {"train", "val", "test"}


class TestSourceDrift:
    """q_source_drift: KS on a PLANTED shifted distribution — the exact
    integer numerator and the smallest-argmax location."""

    def test_planted_shift(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from libpdf_ray.ops.corpus import q_source_drift

        # ref uniform on {10..19}, other uniform on {15..24}: the CDF gap
        # peaks at v=14 with F0=0.5, F1=0 -> ks=0.5 exactly
        ref = [10 + i % 10 for i in range(40)]
        oth = [15 + i % 10 for i in range(60)]
        df = pd.DataFrame({
            "doc_id": np.arange(100, dtype=np.int64),
            "source": ["src0"] * 40 + ["srcX"] * 60,
            "n_chars": np.array(ref + oth, dtype=np.int64),
        })
        pq.write_table(pa.Table.from_pandas(df),
                       str(tmp_path / "documents.parquet"))
        out = q_source_drift(str(tmp_path)).to_pandas()
        assert out["n_ref"].iloc[0] == 40 and out["n_other"].iloc[0] == 60
        assert out["ks_stat"].iloc[0] == 0.5
        assert out["ks_at"].iloc[0] == 14
        assert out["ks_num"].iloc[0] == 20 * 60  # s0=20, s1=0 at v=14
