"""Intra-document page-split parallelism: equality with the monolithic path
and straggler relief for huge manuals."""

import shutil

from libpdf_ray.config import SMART_CROP_CONFIG, PipelineConfig


def _corpus(tmp_path_factory, n_docs=24, skew_pages=30):
    from libpdf_ray.fixtures import write_corpus

    out = str(tmp_path_factory.mktemp("split_corpus"))
    write_corpus(out, n_docs=n_docs, seed=42, shards=3, skew_pages=skew_pages)
    return out


def test_split_equals_monolith(ray_session, tmp_path_factory):
    from libpdf_ray.pipelines.extract import extract_spans, read_corpus
    from libpdf_ray.pipelines.split import extract_spans_split

    corpus = _corpus(tmp_path_factory)
    plain = {
        r["doc_id"]: r["spans"]
        for r in extract_spans(read_corpus(corpus), SMART_CROP_CONFIG).take_all()
    }
    split = {
        r["doc_id"]: r["spans"]
        for r in extract_spans_split(
            corpus, SMART_CROP_CONFIG, split_pages=8, heavy_pages=10
        ).take_all()
    }
    assert split == plain
    # skew docs actually crossed the heavy threshold and took the split path
    heavy = [d for d, s in plain.items() if len(s) > 100]
    assert heavy, "corpus should contain heavy docs"


def test_split_links_and_chapters_cross_ranges(ray_session, tmp_path_factory):
    """A link whose source and target chapters land in different page
    ranges must still resolve (resolution is finish-phase, whole-doc)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from libpdf_ray.fixtures import build_document
    from libpdf_ray.pipelines.split import extract_spans_split
    from libpdf_ray.schema import RAW_DOC_SCHEMA

    import os

    out = str(tmp_path_factory.mktemp("linked_corpus"))
    rows = [build_document(i, "linked") for i in range(3)]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=RAW_DOC_SCHEMA),
        os.path.join(out, "part-0000.parquet"),
    )
    # linked docs have 2 pages; split at 1 page per range forces the link
    # source (page 1) and target chapter (page 2) into different splits
    split = {
        r["doc_id"]: r["spans"]
        for r in extract_spans_split(
            out, SMART_CROP_CONFIG, split_pages=1, heavy_pages=1
        ).take_all()
    }
    for doc in rows:
        assert split[doc["doc_id"]] == doc["expected_spans"]


def test_split_respects_page_range(ray_session, tmp_path_factory):
    from libpdf_ray.pipelines.extract import extract_spans, read_corpus
    from libpdf_ray.pipelines.split import extract_spans_split

    corpus = _corpus(tmp_path_factory, n_docs=12, skew_pages=12)
    cfg = PipelineConfig(smart_page_crop=True, page_range="1-5")
    plain = {
        r["doc_id"]: r["spans"]
        for r in extract_spans(read_corpus(corpus), cfg).take_all()
    }
    split = {
        r["doc_id"]: r["spans"]
        for r in extract_spans_split(corpus, cfg, split_pages=2, heavy_pages=3).take_all()
    }
    assert split == plain
