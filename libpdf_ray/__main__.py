"""CLI: ``python -m libpdf_ray <input_dir> -o <out_dir> [flags]``.

The engine analog of ``python -m libpdf <pdf> -o out.yaml``
(/root/reference/libpdf/core.py:281-533): same feature toggles, but the unit
of work is a corpus directory of sidecar parquet shards and the output is
partitioned span parquet with resume manifests.

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m libpdf_ray",
        description="Ray-Data-native structured-document span extraction",
    )
    p.add_argument("input_dir", help="corpus directory of sidecar parquet "
                   "shards (or of real .pdf/.html files with --input-format)")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--input-format", default="sidecar",
                   choices=("sidecar", "pdf", "html"),
                   help="sidecar: raw-layout parquet corpus (default); "
                        "pdf: a directory/glob of real PDF files decoded "
                        "by the pure-stdlib PdfByteDecoder; "
                        "html: a directory of .html pages reduced to "
                        "main-content spans by the DOM heuristics")
    p.add_argument("--page-range", default="", help="e.g. '3-5,7' (default: all)")
    p.add_argument("--smart-page-crop", action="store_true")
    p.add_argument("--page-crop", default="", metavar="T,B,L,R",
                   help="static crop margins in points (top,bottom,left,right)")
    for flag in ("annotations", "chapters", "paragraphs", "tables", "figures", "rects"):
        p.add_argument(f"--no-{flag}", action="store_true")
    p.add_argument("--media-dir", default="", help="also export figure media objects")
    p.add_argument("--media-format", default="png",
                   choices=("png", "svg", "both"),
                   help="png: REAL 300-dpi raster crops of each figure "
                        "region (stdlib encoder); svg: vector crops; "
                        "both: the pair side by side")
    p.add_argument("--num-cpus", type=int, default=0, help="0 = let Ray decide")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--concurrency", type=int, default=0,
                   help="actor-pool size for the parser (0 = stateless tasks)")
    p.add_argument("--files-per-partition", type=int, default=1,
                   help="input shards per resume partition")
    p.add_argument("--views", default="", metavar="V1,V2",
                   help="also export relational views (any of: elements, "
                        "cells, links, file_meta, pages, text_styles, "
                        "rect_styles) as parquet under <output>/views/")
    p.add_argument("--visual-format", default="both",
                   choices=("png", "svg", "both"),
                   help="visual-debug output: png = the reference's "
                        "150-dpi raster pages, svg = vector, both")
    p.add_argument("--visual-debug", default="", metavar="DIR",
                   help="render one SVG per (doc, page) with element bboxes "
                        "in the reference debug colors under DIR "
                        "(visual_debug_libpdf analog)")
    p.add_argument("--visual-split-elements", action="store_true",
                   help="one subdirectory per element type (reference "
                        "visual_split_elements)")
    p.add_argument("--visual-debug-include-elements", default="",
                   metavar="T1,T2", help="render only these element types")
    p.add_argument("--visual-debug-exclude-elements", default="",
                   metavar="T1,T2", help="render all but these element types")
    p.add_argument("-f", "--format", default="parquet",
                   choices=("parquet", "yaml"),
                   help="parquet (default): partitioned span parquet with "
                        "resume manifests; yaml: one nested object tree per "
                        "document (reference parity with "
                        "'python -m libpdf -f yaml')")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import os

    import ray

    # the north-rule deployment shape is `ray job submit` onto a fixed
    # multi-node cluster: honor RAY_ADDRESS (job submission sets it to the
    # cluster address) and only default to a local session when unset —
    # hardcoding "local" would silently hijack a cluster run onto one node
    init_kwargs = dict(
        address=os.environ.get("RAY_ADDRESS", "local"),
        include_dashboard=False, ignore_reinit_error=True,
        logging_level="ERROR",
    )
    if args.num_cpus:
        init_kwargs["num_cpus"] = args.num_cpus
    if not ray.is_initialized():
        ray.init(**init_kwargs)

    from libpdf_ray.config import PipelineConfig
    from libpdf_ray.pipelines.checkpoint import run_resumable

    page_crop = (
        tuple(float(v) for v in args.page_crop.split(","))
        if args.page_crop
        else (0.0, 0.0, 0.0, 0.0)
    )
    cfg = PipelineConfig(
        page_range=args.page_range,
        page_crop=page_crop,
        smart_page_crop=args.smart_page_crop,
        no_annotations=args.no_annotations,
        no_chapters=args.no_chapters,
        no_paragraphs=args.no_paragraphs,
        no_tables=args.no_tables,
        no_figures=args.no_figures,
        no_rects=args.no_rects,
        parse_batch_size=args.batch_size,
        parse_concurrency=args.concurrency,
    )
    # validate --views BEFORE any work: a typo must not cost a full run
    view_names = [v.strip() for v in args.views.split(",") if v.strip()]
    known_views = {"elements", "cells", "links", "file_meta", "pages",
                   "text_styles", "rect_styles"}
    unknown = [v for v in view_names if v not in known_views]
    if unknown:
        print(f"unknown view(s): {', '.join(unknown)}", file=sys.stderr)
        return 2

    if args.input_format == "html" and (
        args.format == "yaml" or view_names or args.visual_debug
        or args.media_dir
    ):
        # HTML pages reduce to text spans; there is no page geometry to
        # render and no element model beyond chapter/paragraph
        print("--input-format html supports span extraction only "
              "(no yaml/views/visual-debug/media modes)", file=sys.stderr)
        return 2

    def read_input():
        # fresh Dataset per consumer (Datasets are re-executable, but a
        # fresh plan keeps the logs and stats per stage honest)
        if args.input_format == "pdf":
            from libpdf_ray.stages.pdf_decoder import read_pdf_files

            return read_pdf_files(args.input_dir)
        from libpdf_ray.pipelines.extract import read_corpus

        return read_corpus(args.input_dir)

    # side-mode run summaries are reduced IN-STREAM (one partial row per
    # batch + tree sum) — never a per-document driver DataFrame
    from libpdf_ray.pipelines.summary import manifest_summary

    if args.format == "yaml":
        # reference parity mode: one nested YAML tree per document
        # (libpdf/process.py:131-186); the manifest is the run summary
        from libpdf_ray.pipelines.yamldump import dump_yaml

        stats = manifest_summary(
            dump_yaml(read_input(), cfg, args.output,
                      batch_size=args.batch_size),
            sum_cols=("n_spans",),
        )
        summary = {
            "format": "yaml",
            "documents": stats["documents"],
            "errors": stats["errors"],
            "spans": stats["n_spans"],
            "output": args.output,
        }
    elif args.input_format in ("pdf", "html"):
        # real-file corpus: stream spans straight to partitioned parquet
        # (resume manifests are a parquet-shard concept; PDF/HTML runs
        # re-read only the source files, which is the whole job)
        out_dir = os.path.join(args.output, "spans")
        if args.input_format == "html":
            from libpdf_ray.ops.html import html_spans_batch, read_html_files

            spans_ds = read_html_files(args.input_dir).map_batches(
                html_spans_batch, batch_format="pyarrow",
                batch_size=args.batch_size,
            )
        else:
            from libpdf_ray.pipelines.extract import extract_spans

            spans_ds = extract_spans(read_input(), cfg)
        spans_ds.write_parquet(out_dir)
        # summarize from the WRITTEN columns (pruned re-read, not a second
        # full decode of every PDF)
        stats = manifest_summary(
            ray.data.read_parquet(out_dir, columns=["n_spans", "error"]),
            sum_cols=("n_spans",),
        )
        summary = {
            "documents": stats["documents"],
            "errors": stats["errors"],
            "spans": stats["n_spans"],
            "output": args.output,
        }
    else:
        summary = run_resumable(
            args.input_dir, args.output, cfg,
            files_per_partition=args.files_per_partition,
        )
    if view_names:
        # the reference's YAML/JSON element dump, relationally: one parquet
        # table per requested view (the full Root→elements model is
        # losslessly encoded across them)
        import os

        from libpdf_ray.stages.cells import cells_table
        from libpdf_ray.stages.elements import elements_table
        from libpdf_ray.stages.links_view import links_table
        from libpdf_ray.stages.meta import file_meta_table, pages_table
        from libpdf_ray.stages.styles import rect_styles_table, text_styles_table

        view_fns = {
            "elements": lambda ds: elements_table(ds, cfg),
            "cells": lambda ds: cells_table(ds, cfg),
            "links": lambda ds: links_table(ds, cfg),
            "file_meta": file_meta_table,
            "pages": pages_table,
            "text_styles": lambda ds: text_styles_table(ds, cfg),
            "rect_styles": lambda ds: rect_styles_table(ds, cfg),
        }
        exported = []
        for name in view_names:
            out = os.path.join(args.output, "views", name)
            view_fns[name](read_input()).write_parquet(out)
            exported.append(name)
        summary["views"] = exported
    if args.visual_debug:
        from libpdf_ray.stages.elements import render_debug_svg

        inc = tuple(
            v.strip() for v in args.visual_debug_include_elements.split(",")
            if v.strip()
        )
        exc = tuple(
            v.strip() for v in args.visual_debug_exclude_elements.split(",")
            if v.strip()
        )
        dbg = manifest_summary(
            render_debug_svg(
                read_input(), cfg, args.visual_debug,
                include_elements=inc, exclude_elements=exc,
                split_elements=args.visual_split_elements,
                fmt=args.visual_format,
            )
        )
        summary["visual_debug_pages"] = dbg["documents"] - dbg["errors"]
    if args.media_dir:
        from libpdf_ray.state.media_store import export_media_svg

        crops = manifest_summary(
            export_media_svg(
                read_input(), cfg, args.media_dir, fmt=args.media_format
            )
        )
        summary["media_crops"] = crops["documents"] - crops["errors"]
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
