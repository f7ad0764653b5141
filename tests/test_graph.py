"""Connected-components / dedup-apply over near-dup pair tables."""

import ray.data as rd


class TestConnectedComponents:
    def test_chain_and_triangle(self, ray_session):
        from libpdf_ray.ops.graph import connected_components

        pairs = rd.from_items([
            {"id_a": 2, "id_b": 1},
            {"id_a": 2, "id_b": 3},
            {"id_a": 3, "id_b": 4},  # chain 1-2-3-4 (diameter 3 → >1 round)
            {"id_a": 6, "id_b": 5},
            {"id_a": 10, "id_b": 11},
            {"id_a": 11, "id_b": 12},
            {"id_a": 12, "id_b": 10},  # triangle
        ])
        cc = connected_components(pairs, est_nodes=100).to_pandas()
        got = dict(zip(cc["doc_id"], cc["cluster_id"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5,
                       10: 10, 11: 10, 12: 10}

    def test_string_ids(self, ray_session):
        from libpdf_ray.ops.graph import connected_components

        pairs = rd.from_items([
            {"id_a": "b", "id_b": "a"},
            {"id_a": "b", "id_b": "c"},
            {"id_a": "z", "id_b": "y"},
        ])
        cc = connected_components(pairs, est_nodes=10).to_pandas()
        got = dict(zip(cc["doc_id"], cc["cluster_id"]))
        assert got == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}

    def test_matches_networkx_free_bruteforce(self, ray_session):
        """Random graph vs a driver-side union-find oracle."""
        import random

        from libpdf_ray.ops.graph import connected_components

        rng = random.Random(11)
        edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(80)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(61))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {n for e in edges for n in e}
        want = {}
        for n in touched:
            root = find(n)
            want[n] = min(m for m in touched if find(m) == root)
        pairs = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
        cc = connected_components(pairs, est_nodes=100).to_pandas()
        got = dict(zip(cc["doc_id"], cc["cluster_id"]))
        assert got == want

    def test_dedup_keep_representatives(self, ray_session):
        from libpdf_ray.ops.graph import (connected_components,
                                          dedup_keep_representatives)

        pairs = rd.from_items([
            {"id_a": 2, "id_b": 1},
            {"id_a": 5, "id_b": 6},
        ])
        corpus = rd.from_items(
            [{"doc_id": i, "text": f"t{i}"} for i in range(1, 8)]
        )
        kept = dedup_keep_representatives(
            corpus, connected_components(pairs, est_nodes=10)
        ).to_pandas()
        # cluster reps 1 and 5 kept; unique docs 3,4,7 kept; 2 and 6 dropped
        assert sorted(kept["doc_id"]) == [1, 3, 4, 5, 7]
        assert set(kept.columns) == {"doc_id", "text"}
