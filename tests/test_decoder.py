"""The DocumentDecoder seam (round-4 verdict item 5).

The parse boundary is a named protocol so a real PDF-byte decoder
(pdfminer-backed, env-blocked here) can drop in where the synthetic
sidecar decoder sits.  These tests pin the seam: the shipping decoder
satisfies the protocol, parse_batch routes through an injected decoder,
and the decoded dict feeds extract_document to span equality.
"""

import pyarrow as pa

from libpdf_ray.config import SMART_CROP_CONFIG
from libpdf_ray.fixtures import DEFAULT_FAMILIES, build_document
from libpdf_ray.kernels.document import extract_document
from libpdf_ray.stages.decoder import (DocumentDecoder, SidecarDecoder,
                                       decode_sidecar_rows)
from libpdf_ray.stages.parse import DocumentParser, parse_batch


def _sidecar_batch(n=6):
    from libpdf_ray.fixtures import corpus_table

    return corpus_table(n)


def test_sidecar_decoder_satisfies_protocol():
    assert isinstance(SidecarDecoder(), DocumentDecoder)
    # a class with the right method shape also satisfies it (structural)

    class Custom:
        def decode(self, batch):
            return []

    assert isinstance(Custom(), DocumentDecoder)
    assert not isinstance(object(), DocumentDecoder)


def test_decoded_rows_feed_extract_document():
    """decoder output → extract_document == the generator oracle, for every
    fixture family (the span-equality contract crosses the seam intact)."""
    batch = _sidecar_batch()
    rows = SidecarDecoder().decode(batch)
    assert len(rows) == batch.num_rows
    for i, row in enumerate(rows):
        expect = build_document(
            i, DEFAULT_FAMILIES[i % len(DEFAULT_FAMILIES)]
        )["expected_spans"]
        assert extract_document(row, SMART_CROP_CONFIG) == expect


def test_parse_batch_routes_through_injected_decoder():
    """A custom decoder is the single source of documents for parse_batch —
    inject one that rewrites doc_ids and assert the output carries them."""
    batch = _sidecar_batch(3)

    class Renaming:
        def __init__(self):
            self.calls = 0

        def decode(self, b):
            self.calls += 1
            rows = decode_sidecar_rows(b)
            for r in rows:
                r["doc_id"] = "custom-" + r["doc_id"]
            return rows

    dec = Renaming()
    out = parse_batch(batch, SMART_CROP_CONFIG, decoder=dec)
    assert dec.calls == 1
    assert all(d.startswith("custom-") for d in out.column("doc_id").to_pylist())
    # spans unchanged by the rename
    base = parse_batch(batch, SMART_CROP_CONFIG)
    assert out.column("spans").to_pylist() == base.column("spans").to_pylist()


def test_document_parser_holds_decoder_as_actor_state():
    """The actor-pool form freezes the decoder in __init__ (once per
    worker), not per batch."""
    batch = _sidecar_batch(2)

    class Counting(SidecarDecoder):
        def __init__(self):
            self.calls = 0

        def decode(self, b):
            self.calls += 1
            return super().decode(b)

    dec = Counting()
    parser = DocumentParser(SMART_CROP_CONFIG, decoder=dec)
    parser(batch)
    parser(batch)
    assert parser.decoder is dec and dec.calls == 2


def test_default_decoder_is_sidecar():
    assert isinstance(DocumentParser().decoder, SidecarDecoder)
