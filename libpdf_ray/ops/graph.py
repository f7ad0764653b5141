"""Graph ops for dedup: connected components over a near-dup pair table.

Pair families (exact / MinHash / SimHash / n-gram Jaccard / embedding
cosine) emit EDGES; actual deduplication needs the transitive closure —
every document labeled with its duplicate-cluster representative.  This is
the standard MapReduce connected-components problem; we use iterated
min-label propagation ("hash-to-min" family, Rastogi et al. 2013):

    label(v) ← min over {v} ∪ in-neighbors(v) of current labels

Each round is TWO key-only hash-bucket shuffles over (id, id, tag) rows —
edges and labels, never document payloads; the convergence counter rides
the same reduction (no extra pass).  Convergence is O(diameter) rounds;
near-dup graphs are dense clique-ish clusters, so diameter is tiny (2-3).
The driver loop holds only a per-round change COUNT, and each round's
label table is materialized so lineage stays linear in rounds.

``Dataset.join`` is deliberately NOT used here: Ray's hash-shuffle emits
column-less empty pandas blocks for key-partitions that received no rows,
map UDFs are skipped on empty blocks so they survive every downstream
stage, and Arrow's join then fails with "No match for key field" when one
lands on a join side.  The bucketed co-group below is immune (groupby
tolerates the empties) and cheaper: labels are delivered to neighbors in
the same shuffle that groups edges by source.

At 100 TB the label table is |nodes that appear in ≥1 pair| — for dedup
workloads that is the duplicated subset, ≪ corpus.  The edge table streams
from the pair op unchanged.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def _bucketed(ds, key_col: str, fn, n_parts: int):
    """Hash-bucket shuffle + one vectorized combine per bucket (the
    exact_dedup_stats shape — all rows of a key land in one bucket)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__bucket"] = (h % np.uint64(n_parts)).astype(np.int64)
        return df

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        return fn(bucket.drop(columns=["__bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket", num_partitions=n_parts)
        .map_groups(per_bucket, batch_format="pandas")
    )


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         max_rounds: int = 50, est_nodes: int | None = None):
    """(doc_id, cluster_id) for every node in the pair table; ``cluster_id``
    is the component's minimum node id (the canonical representative).

    ``pairs_ds``: Dataset with two id columns (any orientation, duplicates
    fine).  Ids must be orderable scalars (int or string).
    """
    from .util import normalize_blocks, shuffle_partitions

    n_parts = shuffle_partitions(est_keys=est_nodes if est_nodes else 100_000)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df[id_a].to_numpy()
        b = df[id_b].to_numpy()
        return pd.DataFrame({
            "key": np.concatenate([a, b]),
            "val": np.concatenate([b, a]),
            "own": np.zeros(2 * len(df), dtype=np.int64),
        })

    # pair tables usually arrive post-shuffle; normalize away schema-less
    # empty blocks (map UDFs skip them, the label shuffles choke on them)
    edges = normalize_blocks(
        pairs_ds.map_batches(to_edges, batch_format="pandas")
    ).materialize()

    # size-adaptive route: the distributed label propagation pays
    # O(diameter) rounds × 2 shuffle spin-ups (~3 s/round of fixed cost on
    # a tiny graph).  LSH pair tables are ≪ corpus by construction — below
    # the broadcast guard, collect the edges once and run an exact
    # union-find driver-side (same min-label representatives; pinned by a
    # route-equality test).  Above the guard the distributed rounds run
    # unchanged — this is the same small-input discipline as
    # relational.SINGLE_TASK_GROUP_BYTES.
    from .util import BROADCAST_LOOKUP_ROW_LIMIT

    n_edge_rows = edges.count()  # metadata-only after materialize
    if n_edge_rows <= BROADCAST_LOOKUP_ROW_LIMIT:
        import ray.data as rd

        ed = edges.to_pandas()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in zip(ed["key"], ed["val"]):
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN id so the representative is the component min
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        nodes = pd.unique(ed["key"])
        out = pd.DataFrame(
            {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
        )
        return rd.from_pandas(out.reset_index(drop=True))

    # label(v) starts as min(v, neighbors(v)) — the first propagation round
    # fused into initialization.
    def init_labels(bucket: pd.DataFrame) -> pd.DataFrame:
        agg = bucket.groupby("key", sort=False)["val"].min().reset_index()
        return pd.DataFrame({
            "node": agg["key"],
            "label": np.minimum(agg["key"].to_numpy(), agg["val"].to_numpy()),
        })

    labels = _bucketed(edges, "key", init_labels, n_parts).materialize()

    for _ in range(max_rounds):
        tagged = labels.map_batches(
            lambda df: pd.DataFrame({
                "key": df["node"],
                "val": df["label"],
                "own": np.ones(len(df), dtype=np.int64),
            }),
            batch_format="pandas",
        )

        # co-group edges (key=u → neighbor v) with labels (key=u → label):
        # deliver label(u) to every neighbor v, and to u itself (tagged own
        # so the reducer can also compute the change count in-shuffle).
        def deliver(bucket: pd.DataFrame) -> pd.DataFrame:
            own = bucket[bucket["own"] == 1]
            ed = bucket[bucket["own"] == 0]
            merged = ed.merge(
                own[["key", "val"]].rename(columns={"val": "lbl"}),
                on="key", how="inner",
            )
            return pd.DataFrame({
                "node": pd.concat([merged["val"], own["key"]],
                                  ignore_index=True),
                "cand": pd.concat([merged["lbl"], own["val"]],
                                  ignore_index=True),
                "own": np.concatenate([
                    np.zeros(len(merged), dtype=np.int64),
                    np.ones(len(own), dtype=np.int64),
                ]),
            })

        cands = _bucketed(edges.union(tagged), "key", deliver, n_parts)

        def reduce_min(bucket: pd.DataFrame) -> pd.DataFrame:
            new = bucket.groupby("node", sort=False)["cand"].min()
            old = (
                bucket[bucket["own"] == 1]
                .set_index("node")["cand"]
                .reindex(new.index)
            )
            return pd.DataFrame({
                "node": new.index.to_numpy(),
                "label": new.to_numpy(),
                "changed": (new.to_numpy() != old.to_numpy()).astype(np.int64),
            })

        new_labels = _bucketed(cands, "node", reduce_min, n_parts).materialize()
        changed = new_labels.sum("changed") or 0
        labels = new_labels.map_batches(
            lambda df: df[["node", "label"]], batch_format="pandas"
        )
        if not changed:
            break
    else:
        logger.warning("connected_components: no fixpoint in %d rounds",
                       max_rounds)

    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "label": "cluster_id"}),
        batch_format="pandas",
    )


def dedup_keep_representatives(corpus_ds, clusters_ds, id_col: str = "doc_id",
                               est_keys: int | None = None):
    """Drop every clustered document except its cluster representative.

    ``clusters_ds``: output of :func:`connected_components` (doc_id,
    cluster_id).  Documents absent from the cluster table are unique and
    always kept.  One hash join on the id column; corpus payloads stream
    through untouched.  The drops side is post-shuffle, so it is
    block-normalized first (see :func:`libpdf_ray.ops.util.normalize_blocks`).

    ``est_keys``: estimated corpus cardinality for sizing the join shuffle
    (pass :func:`libpdf_ray.ops.util.parquet_row_count` of the corpus);
    defaults to 100k partitioning when unknown.
    """
    from .util import normalize_blocks, shuffle_partitions

    drops = normalize_blocks(
        clusters_ds.map_batches(
            lambda df: df[df["doc_id"] != df["cluster_id"]][["doc_id"]]
            .rename(columns={"doc_id": id_col})
            .assign(__drop=np.int64(1)),
            batch_format="pandas",
        )
    )
    n_parts = shuffle_partitions(est_keys=est_keys if est_keys else 100_000)
    joined = corpus_ds.join(
        drops, "left_outer", num_partitions=n_parts, on=(id_col,)
    )
    return joined.map_batches(
        lambda df: df[df["__drop"].isna()].drop(columns=["__drop"]),
        batch_format="pandas",
    )
