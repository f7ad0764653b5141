"""The flagship extraction pipeline: read → parse → spans, Ray-Data-first.

Replaces the reference lifecycle ``python -m libpdf <pdf>`` → object graph →
YAML (``/root/reference/libpdf/core.py:23-168``) with::

    read_parquet(sidecar shards, pruned columns)
      → map_batches(DocumentParser, batch_format="pyarrow", batch_size=B[, concurrency=N])
      → write_parquet(out_dir)  /  explode_spans for analytics

Scale design (north rule):
- the document is the unit of parallelism; one row = one doc, so no
  cross-document shuffle exists in the hot path (SURVEY §4.3);
- skew (1-page flyers vs 5000-page manuals) is handled by a small
  ``batch_size`` + dynamic batching into an (optional) actor pool: workers
  pull batches, so one huge doc never stalls the others, and Ray's block
  splitting bounds memory.  ``repartition_by_cost`` additionally bin-packs
  pathological corpora (whole blocks of manuals) using the cheap
  ``est_pages`` column without a full shuffle;
- output is partitioned parquet (one file per input shard — the resume unit,
  see ``pipelines.checkpoint``).
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.parse import DocumentParser, explode_spans, parse_batch

#: columns the parser actually consumes — read_parquet prunes the rest
#: (notably the test-only expected_spans column never leaves storage)
PARSE_COLUMNS = [
    "doc_id",
    "est_pages",
    "pages",
    "textboxes",
    "outline",
    "rects",
    "table_grids",
    "figures",
    "annotations",
    "named_dests",
]


def read_corpus(paths, columns=PARSE_COLUMNS, **kwargs) -> "ray.data.Dataset":
    """Read the sidecar corpus with column pruning at the read."""
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def extract_spans(
    ds: "ray.data.Dataset",
    cfg: PipelineConfig | None = None,
) -> "ray.data.Dataset":
    """Sidecar Dataset → (doc_id, spans, n_spans, est_pages) Dataset."""
    cfg = cfg or PipelineConfig()
    kwargs = dict(batch_format="pyarrow", batch_size=cfg.parse_batch_size)
    if cfg.parse_concurrency:
        # stateful actor-pool form: warm workers, pinned CPUs
        return ds.map_batches(
            DocumentParser,
            fn_constructor_kwargs={"cfg": cfg},
            concurrency=cfg.parse_concurrency,
            num_cpus=1,
            **kwargs,
        )
    # stateless-task form: maximally elastic, the default on shared clusters
    return ds.map_batches(parse_batch, fn_kwargs={"cfg": cfg}, **kwargs)


def spans_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exploded per-span view (doc_id, kind, text, media_ref, offset)."""
    return ds.map_batches(explode_spans, batch_format="pyarrow")


def repartition_by_cost(ds: "ray.data.Dataset", target_pages_per_block: int = 512):
    """Optional skew pre-pass: split blocks so no single block carries more
    than ~target estimated pages.  Uses only block-local splitting (a cheap
    map over batches that re-chunks rows), NOT a global shuffle — at 100 TB
    an all-to-all here would dominate the job."""
    import pyarrow as pa

    def split(batch: pa.Table):
        total = 0
        start = 0
        out = []
        pages = batch.column("est_pages").to_pylist()
        for i, p in enumerate(pages):
            total += max(int(p or 1), 1)
            if total >= target_pages_per_block and i + 1 > start:
                out.append(batch.slice(start, i + 1 - start))
                start, total = i + 1, 0
        if start < batch.num_rows:
            out.append(batch.slice(start))
        for t in out:
            yield t

    return ds.map_batches(split, batch_format="pyarrow", batch_size=None)
