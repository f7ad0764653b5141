"""Shared dataset helpers: partition-tuned aggregates and shuffle-free top-k.

Two systematic wins over naive Dataset usage (measured on this node — see
BENCH notes in BASELINE.md):

- ``groupby(...)`` defaults to a partition count meant for huge key spaces;
  a 6-row aggregate then pays for hundreds of empty shuffle tasks (10-15 s
  → ~2 s with a key-cardinality-sized ``num_partitions``).  Every grouped
  op in the engine takes an explicit ``num_partitions``.
- global top-k via ``sort().limit(k)`` range-shuffles the whole dataset
  (~20 s for 15 k rows); :func:`topk` instead takes per-block partial
  top-k (embarrassingly parallel) and merges the ≤ k·n_blocks survivors in
  one single-block task.  At 100 TB the partial pass is the only stage that
  touches the data.
"""

from __future__ import annotations

import pandas as pd


def tune_data_context() -> None:
    """Session-level Ray Data tuning, idempotent; call from any entry point
    that owns query execution (bench, driver contract, tests).

    Measured on this node: the default sort-based shuffle's AggregateMap
    spends ~4 s per block sorting even 2 k-row partial blocks (a 15 k-key
    aggregate took 23 s); the hash-shuffle strategy does the same exchange
    in ~3 s end-to-end."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # aggregator actors default to 1 CPU each: a num_partitions=8 shuffle
    # then reserves 8 whole CPUs for the lifetime of the pipeline and
    # starves upstream map tasks on small clusters (measured: the split
    # pipeline's prepare stage serialized behind them).  Fractional CPUs
    # keep the aggregators schedulable without monopolizing the node.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.25


def topk(ds, keys, descending, k: int):
    """Deterministic global top-k: ``keys`` must be a total order (include
    tie-break columns).  ``descending`` is a list of bools per key."""
    ascending = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(keys, ascending=ascending).head(k)

    survivors = ds.map_batches(partial, batch_format="pandas")
    # ≤ k rows per input block survive; one small task finishes the job
    return survivors.repartition(1).map_batches(partial, batch_format="pandas")
