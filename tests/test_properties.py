"""Property-based tests: structural invariants of the extraction semantics.

Complements the golden-oracle families: for arbitrary (seeded) corpora the
pipeline must be deterministic and structurally sound even where no golden
expectation exists."""

from hypothesis import given, settings
from hypothesis import strategies as st

from libpdf_ray.config import PipelineConfig, SMART_CROP_CONFIG
from libpdf_ray.fixtures import DEFAULT_FAMILIES, build_document
from libpdf_ray.kernels.document import extract_document, extract_document_full


@settings(max_examples=40, deadline=None)
@given(
    doc_index=st.integers(min_value=0, max_value=5000),
    family=st.sampled_from(DEFAULT_FAMILIES),
)
def test_extraction_matches_oracle_everywhere(doc_index, family):
    """The generator-as-oracle equality holds for ANY doc index, not just
    the enumerated test corpus."""
    doc = build_document(doc_index, family, skew_pages=5)
    assert extract_document(doc, SMART_CROP_CONFIG) == doc["expected_spans"]


@settings(max_examples=20, deadline=None)
@given(
    doc_index=st.integers(min_value=0, max_value=2000),
    family=st.sampled_from(DEFAULT_FAMILIES),
)
def test_determinism_and_offsets(doc_index, family):
    doc = build_document(doc_index, family, skew_pages=4)
    a = extract_document(doc, SMART_CROP_CONFIG)
    b = extract_document(doc, SMART_CROP_CONFIG)
    assert a == b  # bit-deterministic (retries preserve span equality)
    assert [s["offset"] for s in a] == list(range(len(a)))
    for s in a:
        assert s["kind"] in {"chapter", "paragraph", "table", "figure", "rect", "link"}
        assert (s["media_ref"] != "") == (s["kind"] == "figure")


@settings(max_examples=15, deadline=None)
@given(doc_index=st.integers(min_value=0, max_value=1000))
def test_uids_unique_per_document(doc_index):
    doc = build_document(doc_index, "outlined")
    _, elements = extract_document_full(doc, SMART_CROP_CONFIG)
    uids = [el["uid"] for el in elements]
    assert len(uids) == len(set(uids))


@settings(max_examples=15, deadline=None)
@given(
    doc_index=st.integers(min_value=0, max_value=1000),
    hi=st.integers(min_value=1, max_value=5),
)
def test_page_range_is_monotone(doc_index, hi):
    """Selecting a prefix of pages yields a prefix-consistent subset: every
    span extracted under the page range also appears (same kind/text) in
    the full extraction."""
    doc = build_document(doc_index, "skew", skew_pages=5)
    full = extract_document(doc, PipelineConfig())
    limited = extract_document(doc, PipelineConfig(page_range=f"1-{hi}"))
    full_keys = [(s["kind"], s["text"]) for s in full]
    lim_keys = [(s["kind"], s["text"]) for s in limited]
    # limited must be a prefix of full for a page-prefix selection
    assert lim_keys == full_keys[: len(lim_keys)]


@settings(max_examples=20, deadline=None)
@given(
    lines=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
            max_size=30,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_hbox_roundtrip(lines):
    """Text join conventions survive arbitrary ASCII content."""
    from libpdf_ray.kernels.textmodel import assemble_hbox

    hbox = assemble_hbox([{"text": ln, "ncolor": None, "fontname": None} for ln in lines])
    for ln, out in zip(lines, hbox["lines"]):
        # single-space word split + ' '-join collapses runs of spaces —
        # that IS the reference convention; words never contain spaces
        assert all(" " not in w["text"] and w["text"] != "" for w in out["words"])
    assert hbox["text"] == "\n".join(" ".join(w for w in ln.split(" ") if w) for ln in lines)
