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
    "outline_nodes",
    "outline_root",
    "names_nodes",
    "rects",
    "segments",
    "figures",
    "annotations",
]


def read_corpus(paths, columns=PARSE_COLUMNS, **kwargs) -> "ray.data.Dataset":
    """Read the sidecar corpus with column pruning at the read.

    Optional sidecar columns (rects, figures, annotations, …) may be
    absent in lean corpora; the projection intersects with the actual file
    schema so such corpora parse with the matching stages as no-ops."""
    if columns:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        probe = paths
        if isinstance(paths, (list, tuple)):
            probe = paths[0]
        if _os.path.isdir(probe):
            files = sorted(_glob.glob(_os.path.join(probe, "*.parquet")))
            probe = files[0] if files else None
        if probe and _os.path.isfile(probe):
            available = set(_pq.ParquetFile(probe).schema_arrow.names)
            columns = [c for c in columns if c in available]
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


def extract_spans_skew_aware(
    paths,
    cfg: PipelineConfig | None = None,
    heavy_pages: int = 200,
    heavy_batch_size: int = 1,
):
    """Skew-aware parse: route heavy manuals and light flyers through
    differently-batched parse stages.

    The 1-page-flyer / 5000-page-manual mix of the north rule breaks any
    single ``batch_size``: small batches drown light docs in task overhead
    (measured 40 s vs 2 s on this node), large batches let one task hold 64
    manuals while the pool idles.  Splitting on the cheap ``est_pages``
    column gives each population its right granularity, with NO shuffle —
    both branches are predicate-filtered scans feeding the same union.

    Trade-off (documented): the input is scanned once per branch.  The scan
    is column-pruned and the predicate prunes parquet row groups where the
    corpus is laid out by size; parse cost dominates the extra read.
    """
    cfg = cfg or PipelineConfig()
    light = ray.data.read_parquet(
        paths, columns=PARSE_COLUMNS, filter=_pages_filter("<", heavy_pages)
    )
    heavy = ray.data.read_parquet(
        paths, columns=PARSE_COLUMNS, filter=_pages_filter(">=", heavy_pages)
    )
    light_cfg = cfg
    heavy_cfg = PipelineConfig(
        **{**cfg.__dict__, "parse_batch_size": heavy_batch_size}
    )
    return extract_spans(light, light_cfg).union(extract_spans(heavy, heavy_cfg))


def _pages_filter(op: str, value: int):
    import pyarrow.dataset as pads

    field = pads.field("est_pages")
    return field < value if op == "<" else field >= value
