"""Driver-collect vs bucketed-join verification paths must be identical.

Round-2 verdict item #1: the LSH pair families (`minhash_lsh_pairs`,
`simhash_neardup_pairs`, `embedding_neardup_pairs`) previously FAILED FAST
when the candidate set exceeded MAX_CANDIDATE_PAIRS.  The bucketed-join
fallback (``Dataset.join`` of the pair table with the payload table, one
join per side) must produce byte-identical pairs on a duplication-saturated
corpus, and ``verify_mode="auto"`` must route (not raise) above the
threshold.
"""

import numpy as np
import pandas as pd
import pytest


def _saturated_corpus(n_docs=60, n_templates=4, seed=11):
    """Duplication-heavy corpus: n_templates base texts, each copied many
    times with tiny perturbations — the shape near-dup detection targets."""
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(200)]
    templates = [
        " ".join(rng.choice(words, size=40, replace=True)) for _ in range(n_templates)
    ]
    rows = []
    for d in range(n_docs):
        t = templates[d % n_templates]
        if rng.random() < 0.5:
            parts = t.split()
            parts[rng.integers(len(parts))] = rng.choice(words)
            t = " ".join(parts)
        rows.append({"doc_id": d, "text": t})
    return rows


def _pairset(df: pd.DataFrame):
    return sorted(zip(df["id_a"].tolist(), df["id_b"].tolist()))


class TestVerifyPaths:
    def test_minhash_bucketed_equals_driver(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import minhash_lsh_pairs

        rows = _saturated_corpus()
        d = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, verify_mode="driver"
        ).to_pandas()
        b = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, verify_mode="bucketed"
        ).to_pandas()
        assert len(d) > 50  # saturated: many true near-dup pairs
        assert _pairset(d) == _pairset(b)
        dj = d.set_index(["id_a", "id_b"])["jaccard"].sort_index()
        bj = b.set_index(["id_a", "id_b"])["jaccard"].sort_index()
        assert np.allclose(dj.to_numpy(), bj.to_numpy())

    def test_simhash_bucketed_equals_driver(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import simhash_neardup_pairs

        rows = _saturated_corpus(n_docs=40)
        d = simhash_neardup_pairs(
            rd.from_items(rows), max_hamming=3, verify_mode="driver"
        ).to_pandas()
        b = simhash_neardup_pairs(
            rd.from_items(rows), max_hamming=3, verify_mode="bucketed"
        ).to_pandas()
        assert _pairset(d) == _pairset(b)

    def test_embedding_bucketed_equals_driver(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import embedding_neardup_pairs

        rng = np.random.default_rng(3)
        base = rng.standard_normal((5, 64))
        rows = []
        for i in range(40):
            v = base[i % 5] + 0.01 * rng.standard_normal(64)
            rows.append({"vec_id": i, "embedding": v.tolist()})
        d = embedding_neardup_pairs(
            rd.from_items(rows), threshold=0.99, verify_mode="driver"
        ).to_pandas()
        b = embedding_neardup_pairs(
            rd.from_items(rows), threshold=0.99, verify_mode="bucketed"
        ).to_pandas()
        assert len(d) > 0
        assert _pairset(d) == _pairset(b)

    def test_auto_routes_to_bucketed_instead_of_raising(self, ray_session):
        """Above max_driver_pairs auto must switch paths, not raise (the
        round-2 behavior)."""
        import ray.data as rd

        from libpdf_ray.ops.dedup import minhash_lsh_pairs

        rows = _saturated_corpus()
        auto = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, verify_mode="auto",
            max_driver_pairs=1,  # force every real candidate set over it
        ).to_pandas()
        ref = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, verify_mode="driver"
        ).to_pandas()
        assert _pairset(auto) == _pairset(ref)

    def test_minhash_exact_equals_allpairs_join(self, ray_session):
        """LSH candidates + exact verify must reproduce the exact all-pairs
        Jaccard join bit-for-bit (64 bands × 2 rows: recall 1 − 1e-8 per
        pair at threshold 0.5) — on a saturated corpus, in both verify
        modes."""
        import ray.data as rd

        from libpdf_ray.ops.dedup import jaccard_pairs_exact, minhash_exact_pairs

        rows = _saturated_corpus()
        exact = jaccard_pairs_exact(
            rd.from_items(rows), threshold=0.5, est_docs=60
        ).to_pandas()
        for mode in ("driver", "bucketed"):
            lsh = minhash_exact_pairs(
                rd.from_items(rows), threshold=0.5, num_perm=128, bands=64,
                verify_mode=mode,
            ).to_pandas()
            assert _pairset(lsh) == _pairset(exact)
            le = lsh.set_index(["id_a", "id_b"]).sort_index()
            ee = exact.set_index(["id_a", "id_b"]).sort_index()
            for col in ("inter", "uni", "jaccard"):
                assert (le[col].to_numpy() == ee[col].to_numpy()).all(), col


class TestCandidateRoutes:
    """Single-task vs distributed candidate generation must be identical
    (round-5: the LSH families' chained candidate shuffles cost ~4 s of
    spin-up at sf0.1 for microseconds of kernel; small exploded sets route
    through one coalesced _bucket_pair_frames task instead)."""

    def test_minhash_single_equals_distributed(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import minhash_lsh_pairs

        rows = _saturated_corpus()
        s = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, candidate_mode="single"
        ).to_pandas()
        d = minhash_lsh_pairs(
            rd.from_items(rows), threshold=0.5, candidate_mode="distributed"
        ).to_pandas()
        assert len(s) > 50
        assert _pairset(s) == _pairset(d)
        sj = s.set_index(["id_a", "id_b"])["jaccard"].sort_index()
        dj = d.set_index(["id_a", "id_b"])["jaccard"].sort_index()
        assert np.allclose(sj.to_numpy(), dj.to_numpy())

    def test_embedding_single_equals_distributed(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import embedding_neardup_pairs

        rng = np.random.default_rng(3)
        base = rng.standard_normal((5, 64))
        rows = [
            {"vec_id": i,
             "embedding": (base[i % 5] + 0.01 * rng.standard_normal(64)).tolist()}
            for i in range(40)
        ]
        s = embedding_neardup_pairs(
            rd.from_items(rows), threshold=0.99, candidate_mode="single"
        ).to_pandas()
        d = embedding_neardup_pairs(
            rd.from_items(rows), threshold=0.99, candidate_mode="distributed"
        ).to_pandas()
        assert len(s) > 0
        assert _pairset(s) == _pairset(d)

    def test_simhash_single_equals_distributed(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import simhash_neardup_pairs

        rows = _saturated_corpus(n_docs=40)
        s = simhash_neardup_pairs(
            rd.from_items(rows), max_hamming=3, candidate_mode="single"
        ).to_pandas()
        d = simhash_neardup_pairs(
            rd.from_items(rows), max_hamming=3, candidate_mode="distributed"
        ).to_pandas()
        assert _pairset(s) == _pairset(d)

    def test_jaccard_single_equals_distributed(self, ray_session):
        """jaccard_pairs_exact's est_bytes small route (one coalesced task)
        must equal the two-shuffle plan bit-for-bit, inter/uni included."""
        import ray.data as rd

        from libpdf_ray.ops.dedup import jaccard_pairs_exact

        rows = _saturated_corpus()
        s = jaccard_pairs_exact(
            rd.from_items(rows), threshold=0.5, est_docs=60, est_bytes=1
        ).to_pandas()
        d = jaccard_pairs_exact(
            rd.from_items(rows), threshold=0.5, est_docs=60, est_bytes=None
        ).to_pandas()
        assert len(s) > 50
        assert _pairset(s) == _pairset(d)
        se = s.set_index(["id_a", "id_b"]).sort_index()
        de = d.set_index(["id_a", "id_b"]).sort_index()
        for col in ("inter", "uni", "jaccard"):
            assert (se[col].to_numpy() == de[col].to_numpy()).all(), col

    def test_auto_routes_single_under_threshold(self):
        """The auto estimate (n_items × keys_per_item × 40 B) must select
        the single route for sf-scale corpora and the distributed route at
        web scale."""
        from libpdf_ray.ops.dedup import SINGLE_TASK_DEDUP_BYTES

        assert 5_000 * 16 * 40 <= SINGLE_TASK_DEDUP_BYTES  # sf0.1 shape
        assert 1_000_000_000 * 16 * 40 > SINGLE_TASK_DEDUP_BYTES  # 1B docs

    def test_unknown_mode_raises(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import minhash_lsh_pairs

        with pytest.raises(ValueError, match="candidate_mode"):
            minhash_lsh_pairs(
                rd.from_items(_saturated_corpus(n_docs=6)),
                candidate_mode="bogus",
            )


class TestJaccardMaxDf:
    """The finite default stop-gram cutoff (round-4 verdict item 4): a hot
    shingle shared by half the corpus must not emit b²/2 pair rows under
    the DEFAULT settings, and max_df=None must stay fully exact."""

    def _skewed_corpus(self, n_docs=80, seed=7):
        """Every even doc carries one identical hot 3-gram ('the same boiler')
        prepended to otherwise-unique text: 40 docs share the gram → the
        unbounded join would emit 40·39/2 = 780 rows for it alone."""
        rng = np.random.default_rng(seed)
        words = [f"uniq{i}" for i in range(4000)]
        rows = []
        for d in range(n_docs):
            body = " ".join(rng.choice(words, size=20, replace=False))
            text = ("the same boiler " + body) if d % 2 == 0 else body
            rows.append({"doc_id": d, "text": text})
        return rows

    def test_hot_gram_is_cut_and_bounded(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.dedup import jaccard_pairs_exact

        rows = self._skewed_corpus()
        # max_df=10 < 40 (the hot gram's df) but above every legitimate
        # gram's df (unique bodies → df 1-2)
        cut = jaccard_pairs_exact(
            rd.from_items(rows), threshold=0.01, max_df=10, est_docs=80
        ).to_pandas()
        exact = jaccard_pairs_exact(
            rd.from_items(rows), threshold=0.01, max_df=None, est_docs=80
        ).to_pandas()
        # exact mode sees the 780 hot-gram pairs; the cutoff removes them
        assert len(exact) >= 780
        assert len(cut) < 100
        # pairs that survive the cut carry identical inter/uni in both modes
        # only when none of their shared grams was cut; here the hot gram is
        # the ONLY shared gram of its pairs, so cut ⊂ exact with equal stats
        ce = cut.set_index(["id_a", "id_b"])
        ee = exact.set_index(["id_a", "id_b"])
        assert set(ce.index) <= set(ee.index)

    def test_default_max_df_is_finite(self):
        import inspect

        from libpdf_ray.ops.dedup import (DEFAULT_JACCARD_MAX_DF,
                                          jaccard_pairs_exact)

        default = inspect.signature(jaccard_pairs_exact).parameters["max_df"].default
        assert default == DEFAULT_JACCARD_MAX_DF and default is not None

    def test_drop_is_logged_not_silent(self, caplog):
        import logging

        from libpdf_ray.ops.dedup import _log_dropped_grams

        with caplog.at_level(logging.WARNING, logger="libpdf_ray.ops.dedup"):
            n = _log_dropped_grams(np.array([2, 3, 40, 41]), max_df=10)
        assert n == 2
        assert any("max_df" in r.message for r in caplog.records)
        # and the quiet cases stay quiet
        caplog.clear()
        assert _log_dropped_grams(np.array([2, 3]), max_df=10) == 0
        assert _log_dropped_grams(np.array([999]), max_df=None) == 0
        assert _log_dropped_grams(np.array([], dtype=int), max_df=1) == 0
        assert not caplog.records


class TestSaturatedBucketDegrade:
    def test_star_pairs_instead_of_raise(self):
        from libpdf_ray.ops.dedup import _bucket_pair_frame

        g = pd.DataFrame({"doc_id": np.arange(50)[::-1]})
        out = _bucket_pair_frame(g, "doc_id", max_ids=10)
        # star around the min id: n-1 rows, all anchored at 0
        assert len(out) == 49
        assert (out["id_a"] == 0).all()
        assert sorted(out["id_b"]) == list(range(1, 50))

    def test_triu_matches_nested_loop_order(self):
        from libpdf_ray.ops.dedup import _bucket_pair_frame

        g = pd.DataFrame({"doc_id": [5, 3, 9, 3, 1]})
        out = _bucket_pair_frame(g, "doc_id")
        expect = []
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expect.append((ids[i], ids[j]))
        assert list(zip(out["id_a"], out["id_b"])) == expect
