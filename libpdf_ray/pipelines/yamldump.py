"""Hierarchical YAML dump — parity with ``python -m libpdf -f yaml``.

The reference's primary output is one YAML file per PDF holding the nested
object tree ``{"root": {... chapters contain their content ...}}``
(``/root/reference/libpdf/process.py:131-186`` via ``to_dict_output``'s
recursive model walk).  The engine's scale output is relational span/view
parquet; this mode reconstructs the reference's NESTED tree per document —
chapter nesting from the elements' uid paths (``chapter.1/chapter.1.1/
paragraph.2``), link spans attached to their carrier element — and writes
one YAML file per document.

Executed distributed, same shape as the media sink: each ``map_batches``
task extracts and dumps its own documents (atomic tmp+rename writes →
idempotent on retry, resumable for free) and returns a manifest row per
document.  A debugging/hand-off format: at corpus scale the parquet views
remain the real sink, so files-per-doc fan-out is acceptable here.

The tree is built by the pure, unit-tested pair :func:`build_doc_tree` /
:func:`flatten_tree`, with the round-trip contract

    flatten_tree(build_doc_tree(spans, elements)) == spans

pinned for every fixture family (``tests/test_yamldump.py``).
"""

from __future__ import annotations

import os

import pandas as pd

from ..config import PipelineConfig


def build_doc_tree(spans: list, elements: list) -> dict:
    """Ordered (spans, elements) of ONE document → nested reference tree.

    ``elements`` (from ``extract_document_full``) align 1:1 with the
    non-link spans, in document order; a ``link`` span is an attribute of
    the element preceding it (reference: links live on textbox elements,
    not in the element tree — libpdf/models/link.py).  Nesting comes from
    each element's uid path: ``a/b/c`` hangs under the node with uid
    ``a/b`` (parents always precede children in document order)."""
    root: dict = {"type": "root", "content": []}
    by_path: dict = {"": root}
    out_nodes: list = []
    j = 0
    for sp in spans:
        if sp["kind"] == "link":
            carrier = out_nodes[-1] if out_nodes else root
            carrier.setdefault("links", []).append(
                {"text": sp["text"], "media_ref": sp["media_ref"]}
            )
            continue
        if j >= len(elements):
            raise ValueError(
                f"span/element misalignment: span {sp['kind']!r} at offset "
                f"{sp.get('offset')} has no element"
            )
        el = elements[j]
        j += 1
        if el["etype"] != sp["kind"]:
            raise ValueError(
                f"span/element misalignment: span kind {sp['kind']!r} vs "
                f"element {el['uid']!r} ({el['etype']!r})"
            )
        node = {
            "type": el["etype"],
            "uid": el["uid"],
            "text": sp["text"],
            "media_ref": sp["media_ref"],
            "page": int(el["page"]) if el.get("page") is not None else None,
        }
        parent_path = el["uid"].rsplit("/", 1)[0] if "/" in el["uid"] else ""
        parent = by_path.get(parent_path, root)
        parent.setdefault("content", []).append(node)
        by_path[el["uid"]] = node
        out_nodes.append(node)
    if j != len(elements):
        raise ValueError(f"{len(elements) - j} element(s) without a span")
    return {"root": root}


def flatten_tree(tree: dict) -> list:
    """Inverse of :func:`build_doc_tree`: depth-first walk re-emitting the
    original ordered span list (offsets re-densified by emission order)."""
    out: list = []

    def emit_links(node):
        for link in node.get("links", []):
            out.append(
                {
                    "kind": "link",
                    "text": link["text"],
                    "media_ref": link["media_ref"],
                    "offset": len(out),
                }
            )

    def walk(node):
        for child in node.get("content", []):
            out.append(
                {
                    "kind": child["type"],
                    "text": child["text"],
                    "media_ref": child["media_ref"],
                    "offset": len(out),
                }
            )
            emit_links(child)
            walk(child)

    emit_links(tree["root"])  # pre-content links (defensive; normally none)
    walk(tree["root"])
    return out


class YamlDumper:
    """Actor-pool sink: raw corpus rows → one ``<doc_id>.yaml`` each,
    manifest row (doc_id, path, n_spans, error) per document."""

    def __init__(self, cfg: PipelineConfig, out_dir: str):
        self.cfg = cfg
        self.out_dir = out_dir

    def __call__(self, batch) -> pd.DataFrame:
        import yaml

        from ..kernels.document import extract_document_full
        from ..stages.decoder import SidecarDecoder

        rows = SidecarDecoder().decode(batch)
        doc_ids, paths, n_spans, errors = [], [], [], []
        os.makedirs(self.out_dir, exist_ok=True)
        for row in rows:
            doc_ids.append(row["doc_id"])
            path = os.path.join(self.out_dir, f"{row['doc_id']}.yaml")
            try:
                spans, elements = extract_document_full(row, self.cfg)
                tree = build_doc_tree(spans, elements)
                text = yaml.safe_dump(
                    tree, sort_keys=False, allow_unicode=True, width=100
                )
                tmp = path + ".tmp"
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(text)
                os.replace(tmp, path)  # atomic, idempotent on retry
                paths.append(path)
                n_spans.append(len(spans))
                errors.append("")
            except Exception as exc:  # noqa: BLE001 - poison-doc discipline
                paths.append("")
                n_spans.append(0)
                errors.append(f"{type(exc).__name__}: {exc}")
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "path": paths,
                "n_spans": n_spans,
                "error": errors,
            }
        )


def dump_yaml(corpus_ds, cfg: PipelineConfig, out_dir: str,
              batch_size: int = 32, concurrency: int = 2):
    """Corpus → per-document YAML trees under ``out_dir``; returns the
    manifest Dataset (consume it to drive execution)."""
    return corpus_ds.map_batches(
        YamlDumper,
        fn_constructor_kwargs={"cfg": cfg, "out_dir": out_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
