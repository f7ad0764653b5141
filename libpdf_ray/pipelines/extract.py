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
    "raw_annots",
]


def read_corpus(paths, columns=PARSE_COLUMNS, **kwargs) -> "ray.data.Dataset":
    """Read the sidecar corpus with column pruning at the read.

    Optional sidecar columns (rects, figures, raw_annots, …) may be
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
    decoder=None,
) -> "ray.data.Dataset":
    """Raw document Dataset → (doc_id, spans, n_spans, est_pages) Dataset.

    ``decoder`` is the parse-boundary seam (``stages/decoder.py``):
    default sidecar rows; pass ``PdfByteDecoder()`` for a Dataset of
    ``{doc_id, pdf_bytes}`` rows (``read_pdf_files``)."""
    cfg = cfg or PipelineConfig()
    kwargs = dict(batch_format="pyarrow", batch_size=cfg.parse_batch_size)
    if cfg.parse_concurrency:
        # stateful actor-pool form: warm workers, pinned CPUs
        return ds.map_batches(
            DocumentParser,
            fn_constructor_kwargs={"cfg": cfg, "decoder": decoder},
            concurrency=cfg.parse_concurrency,
            num_cpus=1,
            **kwargs,
        )
    # stateless-task form: maximally elastic, the default on shared clusters
    return ds.map_batches(
        parse_batch, fn_kwargs={"cfg": cfg, "decoder": decoder}, **kwargs
    )


def spans_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exploded per-span view (doc_id, kind, text, media_ref, offset)."""
    return ds.map_batches(explode_spans, batch_format="pyarrow")


def list_fragments(paths) -> list:
    """Parquet (file, row-group) fragment descriptors — the work units of
    the fused read+parse path."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    if isinstance(paths, str):
        paths = [paths]
    files = []
    for p in paths:
        if _os.path.isdir(p):
            files.extend(sorted(_glob.glob(_os.path.join(p, "*.parquet"))))
        else:
            files.append(p)
    items = []
    for f in files:
        md = _pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            items.append(
                {
                    "path": f,
                    "rg": rg,
                    "bytes": int(md.row_group(rg).total_byte_size),
                }
            )
    # HEAVY-FIRST: schedule the most expensive fragments first so the
    # stragglers of the last wave are the lightest tasks, not the
    # heaviest (the classic LPT bound) — row-group byte size is the
    # parse-cost proxy (word payloads dominate both).  Path tie-break
    # keeps the order deterministic.
    items.sort(key=lambda it: (-it["bytes"], it["path"], it["rg"]))
    return items


def extract_spans_fused(paths, cfg: PipelineConfig | None = None,
                        fragments_per_task: int | None = None,
                        row_filter=None):
    """Read+parse FUSED into one task per parquet row group.

    The separate ReadParquet → MapBatches plan ships every raw block
    (word-struct payloads are the bulk of the bytes) through the object
    store between the two operators; fusing the read into the parse task
    reads each fragment locally and only the compact span output enters
    the object store.  Measured on the 4200-doc bench corpus at 4 CPUs:
    88.9 s (unfused, 1 row group/file) → 73.5 s (unfused, aligned row
    groups) → 65.5 s fused, vs a 57.7 s no-Ray multiprocessing floor.

    Trade-offs (why this is not the default API path): no reader-level
    predicate pushdown or stats, and fragment granularity is fixed at the
    corpus' row-group size — keep writing corpora with
    ``row_group_size ≈ parse_batch_size`` (fixtures.write_corpus default).
    Column pruning is preserved (``read_row_group(columns=...)``).

    ``row_filter``: optional callable ``pa.Table -> pa.BooleanArray``
    applied to each fragment INSIDE the fused task (the stand-in for the
    reader predicate this path gives up) — rows failing it never reach the
    parser or the object store.
    """
    import pyarrow as pa
    import pyarrow.parquet as _pq

    cfg = cfg or PipelineConfig()
    items = list_fragments(paths)

    if fragments_per_task is None:
        # coalesce fragments toward ~2 task waves per CPU.  Round 3 kept
        # ≥3 waves because heavy fragment groups became straggler tails
        # (44 tasks at 32 CPUs regressed 9.6 → 11.9 s on the pre-speedup
        # kernel); the round-4 kernel cut per-task wall ~10× so dispatch
        # overhead now dominates and fragments are near-uniform (families
        # interleave per doc index: measured max/mean task wall = 2.0).
        # Re-swept at 32 CPUs on the bench corpus: 1/2/3/4 frags per task
        # = 1.97/1.66/1.61/1.69 s — 2-3 wins, cap 4 unchanged.
        from ..ops.util import cluster_cpus

        per = round(len(items) / max(1, 2 * cluster_cpus()))
        fragments_per_task = int(max(1, min(4, per)))

    def read_and_parse(batch: pa.Table) -> pa.Table:
        outs = []
        for item in batch.to_pylist():
            pf = _pq.ParquetFile(item["path"])
            avail = set(pf.schema_arrow.names)
            t = pf.read_row_group(
                int(item["rg"]),
                columns=[c for c in PARSE_COLUMNS if c in avail],
            )
            if row_filter is not None:
                t = t.filter(row_filter(t))
            outs.append(parse_batch(t, cfg))
        return pa.concat_tables(outs)

    return ray.data.from_items(
        items, override_num_blocks=max(1, len(items))
    ).map_batches(
        read_and_parse, batch_format="pyarrow", batch_size=fragments_per_task
    )


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
