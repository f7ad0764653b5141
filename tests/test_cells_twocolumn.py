"""Cell-level table view + two-column reading-order parity."""

from libpdf_ray.config import SMART_CROP_CONFIG
from libpdf_ray.fixtures import build_document
from libpdf_ray.kernels.document import extract_document


def test_two_column_interleaves_by_y():
    """No column detection, like the reference (two_colums_sampe.pdf):
    reading order strictly (page, height − y0)."""
    for i in range(25):
        doc = build_document(i, "twocolumn")
        assert extract_document(doc, SMART_CROP_CONFIG) == doc["expected_spans"]


def test_cells_table(ray_session, small_corpus_dir):
    from libpdf_ray.pipelines.extract import read_corpus
    from libpdf_ray.stages.cells import cells_table

    df = cells_table(read_corpus(small_corpus_dir), SMART_CROP_CONFIG).to_pandas()
    assert len(df) > 0
    # cells are 1-based row/col addressed with non-empty text (merged/empty
    # slots produce no Cell, tables.py:168-171 semantics)
    assert (df["row"] >= 1).all() and (df["col"] >= 1).all()
    assert (df["text"] != "").all()
    assert df["table_uid"].str.contains("table").all()
    # geometry: each cell inside its page coordinate space
    assert (df["x1"] > df["x0"]).all() and (df["y1"] > df["y0"]).all()

    # cross-check one known grid: the tables family's 3×3 grid carries 9
    # non-empty cells, the 2×2 grid carries 3 (one merged slot)
    doc = build_document(6, "tables")
    from libpdf_ray.kernels.document import extract_document_full

    _, elements = extract_document_full(doc, SMART_CROP_CONFIG)
    tables = [el for el in elements if el["etype"] == "table"]
    assert sorted(len(t["cells"]) for t in tables) == [3, 9]
