"""Corpus-level boilerplate strip + poison-document handling."""

import pyarrow as pa

from libpdf_ray.schema import SPANS_TYPE


def _corpus(ray_session, n_docs=10):
    import ray.data as rd

    rows = []
    for i in range(n_docs):
        spans = [
            {"kind": "paragraph", "text": "COOKIE BANNER ACCEPT ALL", "media_ref": "", "offset": 0},
            {"kind": "paragraph", "text": f"unique body {i}", "media_ref": "", "offset": 1},
            {"kind": "figure", "text": "", "media_ref": f"media/d{i}/f.png", "offset": 2},
        ]
        if i % 2 == 0:
            spans.insert(1, {"kind": "paragraph", "text": "NAV HOME ABOUT", "media_ref": "", "offset": 99})
        spans = [{**s, "offset": j} for j, s in enumerate(spans)]
        rows.append({"doc_id": f"d{i}", "spans": spans})
    table = pa.Table.from_pylist(
        rows, schema=pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])
    )
    return rd.from_arrow(table)


def test_find_and_strip_boilerplate(ray_session):
    from libpdf_ray.ops.boilerplate import find_boilerplate_hashes, strip_boilerplate
    from libpdf_ray.stages.parse import explode_spans

    corpus = _corpus(ray_session)
    spans = corpus.map_batches(explode_spans, batch_format="pyarrow")
    hot, total = find_boilerplate_hashes(spans, min_doc_fraction=0.3, min_docs=3)
    assert total == 10
    assert len(hot) == 2  # banner (10 docs) + nav (5 docs ≥ 3)

    stripped = strip_boilerplate(corpus, hot).to_pandas()
    for _, row in stripped.iterrows():
        texts = [s["text"] for s in row["spans"]]
        assert "COOKIE BANNER ACCEPT ALL" not in texts
        assert "NAV HOME ABOUT" not in texts
        assert any(t.startswith("unique body") for t in texts)
        # offsets re-densified, figures untouched
        assert [s["offset"] for s in row["spans"]] == list(range(len(row["spans"])))
        assert any(s["kind"] == "figure" for s in row["spans"])


def test_unique_body_survives_threshold(ray_session):
    from libpdf_ray.ops.boilerplate import find_boilerplate_hashes
    from libpdf_ray.stages.parse import explode_spans

    spans = _corpus(ray_session).map_batches(explode_spans, batch_format="pyarrow")
    hot, _ = find_boilerplate_hashes(spans, min_doc_fraction=0.9, min_docs=9)
    assert len(hot) == 1  # only the banner crosses 90%


def test_poison_document_becomes_error_row(ray_session):
    """A malformed document yields an error row, not a dead task."""
    import ray.data as rd

    from libpdf_ray.config import SMART_CROP_CONFIG
    from libpdf_ray.fixtures import build_document
    from libpdf_ray.pipelines.extract import extract_spans

    good = build_document(0, "plain")
    bad = dict(good)
    bad["doc_id"] = "doc-poison"
    # null page height → float(None) raises inside extraction (schema stays
    # consistent so the Arrow ingest itself succeeds)
    bad["pages"] = [{"number": 1, "obj_id": 9942, "width": 612.0, "height": None}]
    ds = rd.from_items([good, bad])
    out = extract_spans(ds, SMART_CROP_CONFIG).to_pandas()
    assert len(out) == 2
    poison = out[out["doc_id"] == "doc-poison"].iloc[0]
    assert poison["error"] != "" and poison["n_spans"] == 0
    ok = out[out["doc_id"] == good["doc_id"]].iloc[0]
    assert ok["error"] == "" and ok["n_spans"] > 0


def test_single_pass_no_double_execution(ray_session):
    """Round-2 verdict item #4: the span table must be consumed by exactly
    ONE streaming pass (the old shape either double-executed the upstream
    extraction or pinned the full span corpus via materialize())."""
    import ray
    import ray.data as rd

    from libpdf_ray.ops.boilerplate import find_boilerplate_hashes
    from libpdf_ray.stages.parse import explode_spans

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self):
            self.n += 1

        def get(self):
            return self.n

    corpus = _corpus(ray_session).repartition(4)

    def tapped(counter):
        def tap(df):
            ray.get(counter.incr.remote())
            return df

        return (
            corpus.map_batches(explode_spans, batch_format="pyarrow")
            .map_batches(tap, batch_format="pandas", batch_size=None)
        )

    # baseline: one full consumption = this many per-block calls
    c0 = Counter.remote()
    tapped(c0).count()
    one_pass_calls = ray.get(c0.get.remote())
    assert one_pass_calls > 0

    c1 = Counter.remote()
    hot, total = find_boilerplate_hashes(
        tapped(c1), min_doc_fraction=0.3, min_docs=3
    )
    assert total == 10 and len(hot) == 2  # results unchanged
    assert ray.get(c1.get.remote()) == one_pass_calls
