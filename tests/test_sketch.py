"""Sketch accuracy vs exact answers."""

import numpy as np
import pandas as pd

from libpdf_ray.ops.sketch import HLL, _hash64


class TestHLLKernel:
    def test_estimate_accuracy(self):
        rng = np.random.default_rng(1)
        values = rng.integers(0, 10_000_000, size=60_000)
        exact = len(set(values.tolist()))
        hll = HLL()
        hll.add_hashes(
            np.fromiter((_hash64(v) for v in values), dtype=np.uint64, count=len(values))
        )
        est = hll.estimate()
        assert abs(est - exact) / exact < 0.05

    def test_merge_equals_union(self):
        a_vals = [f"a{i}" for i in range(5000)]
        b_vals = [f"b{i}" for i in range(5000)] + a_vals[:1000]
        def sk(vals):
            h = HLL()
            h.add_hashes(np.fromiter((_hash64(v) for v in vals), dtype=np.uint64, count=len(vals)))
            return h
        merged = sk(a_vals).merge(sk(b_vals))
        both = sk(a_vals + b_vals)
        assert np.array_equal(merged.registers, both.registers)

    def test_serialization_roundtrip(self):
        h = sk = HLL()
        sk.add_hashes(np.fromiter((_hash64(i) for i in range(100)), dtype=np.uint64, count=100))
        again = HLL.from_bytes(h.to_bytes())
        assert np.array_equal(h.registers, again.registers)


class TestSketchDatasets:
    def test_distinct_count_sketch(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.sketch import distinct_count_sketch

        ds = rd.read_parquet(
            "/root/testdata/sf0.01/lineitem.parquet", columns=["l_partkey"]
        )
        est = distinct_count_sketch(ds, "l_partkey").to_pandas()["estimate"][0]
        import duckdb

        exact = duckdb.sql(
            "SELECT count(DISTINCT l_partkey) FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
        ).fetchone()[0]
        assert abs(est - exact) / exact < 0.06

    def test_quantile_sketch(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.sketch import quantile_sketch

        ds = rd.read_parquet(
            "/root/testdata/sf0.01/lineitem.parquet", columns=["l_extendedprice"]
        )
        out = quantile_sketch(ds, "l_extendedprice", quantiles=(0.5,)).to_pandas()
        import duckdb

        exact = duckdb.sql(
            "SELECT median(l_extendedprice) FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')"
        ).fetchone()[0]
        est = out["estimate"][0]
        assert abs(est - exact) / exact < 0.1

    def test_bottomk_deterministic(self, ray_session):
        import ray.data as rd

        from libpdf_ray.ops.sketch import bottomk_sample

        ds = rd.read_parquet(
            "/root/testdata/sf0.01/lineitem.parquet", columns=["l_partkey"]
        )
        a = bottomk_sample(ds, "l_partkey", k=100).to_pandas()
        b = bottomk_sample(ds, "l_partkey", k=100).to_pandas()
        assert a["value"].tolist() == b["value"].tolist()
