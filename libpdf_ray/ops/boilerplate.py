"""Corpus-level boilerplate detection and stripping.

The intra-document smart page crop (kernels/headerfooter.py) removes
furniture that repeats across a document's pages; this operator is its
corpus-level sibling — the "HTML boilerplate strip" of the north rule:
paragraphs whose exact text recurs across many *documents* (nav bars,
cookie banners, license blurbs) are detected by a grouped count over
content hashes and removed from every document's span list.

Scale shape: ONE streaming pass over the span table and ONE shuffle of
(hash, doc_id) pairs (never text bodies) with a per-batch combiner; the
corpus doc count rides the same shuffle as marker rows, so nothing is
materialized and nothing executes twice.  The resulting boilerplate hash
set is tiny and is broadcast (``ray.put``) into a vectorized filter pass.
Span offsets are re-densified so the output is again a valid span corpus.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def _span_hash(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "ignore")).hexdigest()


# marker rows ride the same shuffle as (hash, doc_id) pairs; the marker
# "hash" can never collide with an md5 hex digest
_DOC_MARKER = "\x00doc"


def find_boilerplate_hashes(
    spans_ds,
    min_doc_fraction: float = 0.05,
    min_docs: int = 3,
    kinds: tuple = ("paragraph",),
    est_span_rows: int | None = None,
):
    """Return (the boilerplate hash set, total doc count).

    ``spans_ds`` is the exploded span table (doc_id, kind, text, …).  A
    span text is boilerplate when distinct documents containing it ≥
    max(min_docs, min_doc_fraction · n_docs).

    Single pass, single shuffle (round-2 verdict item #4): each batch emits
    per-batch-deduped (hash, doc_id) pairs PLUS one ``_DOC_MARKER`` row per
    distinct doc; the bucketed co-group counts distinct docs per hash and —
    in the marker rows' buckets (keyed by doc_id so a doc straddling
    batches collapses) — distinct docs overall.  Nothing upstream is
    materialized, nothing executes twice, and the driver collects only
    bucket-level count rows.  Pass ``est_span_rows`` to size the shuffle
    when the caller knows the corpus scale."""
    from .util import shuffle_partitions

    n_parts = shuffle_partitions(est_keys=est_span_rows)
    n_buckets = 4 * n_parts

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["kind"].isin(kinds) & (df["text"] != "")]
        pair = pd.DataFrame(
            {
                "h": [_span_hash(t) for t in sub["text"]],
                "doc_id": sub["doc_id"],
            }
        ).drop_duplicates()  # per-batch combiner: one (hash, doc) pair
        docs = pd.DataFrame(
            {"h": _DOC_MARKER, "doc_id": df["doc_id"].drop_duplicates()}
        )
        # pair rows co-locate by hash prefix; marker rows by doc_id (so
        # each doc's markers meet in one bucket and dedupe there)
        pair = pair.assign(
            bucket=pd.Series(
                [int(h[:4], 16) for h in pair["h"]], index=pair.index,
                dtype="int64",
            )
        )
        docs = docs.assign(
            bucket=pd.util.hash_pandas_object(docs["doc_id"], index=False)
            .astype("int64")
            .abs()
        )
        out = pd.concat([pair, docs], ignore_index=True)
        return out.assign(bucket=out["bucket"] % n_buckets)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if "h" not in g.columns or not len(g):
            return pd.DataFrame(
                {
                    "h": pd.Series([], dtype="object"),
                    "n_docs": pd.Series([], dtype="int64"),
                }
            )
        distinct = g.drop_duplicates(["h", "doc_id"])
        vc = distinct["h"].value_counts()
        return pd.DataFrame({"h": vc.index, "n_docs": vc.to_numpy().astype("int64")})

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        # the global threshold isn't known until marker rows are summed,
        # but min_docs is a lower bound — drop the sub-floor tail (the
        # overwhelming majority of hashes) before the driver collect
        if "h" not in df.columns:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="object"),
                 "n_docs": pd.Series([], dtype="int64")}
            )
        return df[(df["n_docs"] >= min_docs) | (df["h"] == _DOC_MARKER)]

    counts = (
        spans_ds.map_batches(pairs, batch_format="pandas")
        .groupby("bucket", num_partitions=n_parts)
        .map_groups(count_bucket, batch_format="pandas")
        .map_batches(prune, batch_format="pandas")
        .to_pandas()
    )
    if "h" not in counts.columns or not len(counts):
        return set(), 0
    marker = counts["h"] == _DOC_MARKER
    total = int(counts.loc[marker, "n_docs"].sum())
    threshold = max(min_docs, int(min_doc_fraction * total))
    hot = counts[~marker & (counts["n_docs"] >= threshold)]
    return set(hot["h"]), total


def strip_boilerplate(
    corpus_ds,
    boilerplate_hashes: set,
    kinds: tuple = ("paragraph",),
):
    """Filter boilerplate spans out of the NESTED corpus (doc_id, spans)
    and re-densify offsets.

    Operating on the nested shape keeps the edit intra-row — a document can
    never straddle a batch boundary, so offset re-densification needs no
    shuffle.  The hash set is broadcast once per worker.

    The kernel is Arrow-vectorized (round-3 verdict item 6): the batch's
    span lists are flattened ONCE to their struct children, the keep mask /
    per-doc kept counts / re-densified offsets are numpy array ops over the
    flat rows, and the output ListArray is rebuilt from filtered child
    arrays — no per-document ``to_pylist`` round-trip, no per-span dict
    rebuild.  md5 is inherently per-string, so hashing runs only over the
    DISTINCT candidate texts of the batch (boilerplate repeats by
    definition, so distinct ≪ total)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..schema import SPAN_STRUCT

    ref = ray.put(frozenset(boilerplate_hashes))

    class Strip:
        def __init__(self):
            import pyarrow.compute as pc

            self.pc = pc
            self.hot = ray.get(ref)
            self.kind_set = pa.array(sorted(set(kinds)), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            pc = self.pc
            spans = batch.column("spans")
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            sizes = (
                pc.list_value_length(spans)
                .fill_null(0)  # null spans list = 0 rows; flatten() skips
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            values = spans.flatten()

            drop = np.zeros(len(values), dtype=bool)
            if len(values) and self.hot:
                kind_in = pc.is_in(
                    values.field("kind"), value_set=self.kind_set
                ).to_numpy(zero_copy_only=False)
                cand_idx = np.flatnonzero(kind_in)
                if len(cand_idx):
                    texts = values.field("text").to_numpy(zero_copy_only=False)
                    uniq, inv = np.unique(texts[cand_idx], return_inverse=True)
                    uniq_hot = np.fromiter(
                        (_span_hash(t) in self.hot for t in uniq),
                        dtype=bool,
                        count=len(uniq),
                    )
                    drop[cand_idx] = uniq_hot[inv]

            keep = ~drop
            doc_idx = np.repeat(np.arange(len(sizes)), sizes)
            kept_counts = np.bincount(doc_idx[keep], minlength=len(sizes))
            starts = np.concatenate(([0], np.cumsum(kept_counts)[:-1]))
            new_off = np.arange(int(keep.sum()), dtype=np.int32) - np.repeat(
                starts, kept_counts
            ).astype(np.int32)

            keep_arr = pa.array(keep)
            new_values = pa.StructArray.from_arrays(
                [
                    values.field("kind").filter(keep_arr),
                    values.field("text").filter(keep_arr),
                    values.field("media_ref").filter(keep_arr),
                    pa.array(new_off, pa.int32()),
                ],
                fields=list(SPAN_STRUCT),
            )
            offsets = pa.array(
                np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
            )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "spans": pa.ListArray.from_arrays(offsets, new_values),
                    "n_spans": pa.array(kept_counts.astype(np.int32), pa.int32()),
                }
            )

    return corpus_ds.map_batches(Strip, batch_format="pyarrow", concurrency=2)


def boilerplate_report(spans_ds, min_doc_fraction: float = 0.05, min_docs: int = 3):
    """(h, n_docs) rows for every boilerplate paragraph — the audit view."""
    hot, total = find_boilerplate_hashes(spans_ds, min_doc_fraction, min_docs)
    import ray.data as rd

    return rd.from_items(
        [{"h": h, "corpus_docs": total} for h in sorted(hot)]
    )


def main_content_labels(corpus_ds, short_tokens: int = 5):
    """Readability-style main-content classification over span sequences —
    the "DOM heuristics" leg of main-content extraction, re-expressed on
    the engine's span model (no DOM exists post-extraction; the span
    sequence IS the document tree, flattened).

    Deterministic per-span rules (SQL-expressible, so the whole operator
    is hash-checked against a DuckDB window-function oracle):

    - ``chapter`` → ``heading`` (structural, always kept)
    - ``link`` → ``anchor``
    - ``table`` / ``figure`` / ``rect`` → ``content``
    - ``paragraph`` → ``nav`` when it is SHORT (< ``short_tokens`` words)
      and immediately followed by a link span — the link-density signature
      of navigation/chrome (readability's link-density heuristic at span
      granularity); else ``main``.

    Input: the NESTED corpus (doc_id, spans) so the next-span lookup stays
    intra-row — a document never straddles a batch.  Output: exploded
    (doc_id, offset, kind, label) rows."""
    import numpy as np
    import pyarrow as pa

    def label(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        import pyarrow.compute as pc

        sizes = (
            pc.list_value_length(spans)
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        values = spans.flatten()
        n = len(values)
        kinds = values.field("kind").to_numpy(zero_copy_only=False)
        texts = values.field("text").to_numpy(zero_copy_only=False)
        offsets = values.field("offset").to_numpy(zero_copy_only=False)

        # next span's kind within the same document: shift by -1, then
        # blank out each document's LAST span (doc boundary)
        next_kind = np.empty(n, dtype=object)
        if n:
            next_kind[:-1] = kinds[1:]
            next_kind[-1] = None
            last_rows = np.cumsum(sizes) - 1
            next_kind[last_rows[sizes > 0]] = None

        out = np.full(n, "main", dtype=object)
        kind_arr = np.asarray(kinds, dtype=object)
        out[kind_arr == "chapter"] = "heading"
        out[kind_arr == "link"] = "anchor"
        out[np.isin(kind_arr.astype(str), ("table", "figure", "rect"))] = "content"
        is_par = kind_arr == "paragraph"
        if is_par.any():
            ntok = np.fromiter(
                ((len(texts[i].split()) if texts[i] else 0) if is_par[i] else 0
                 for i in range(n)),
                dtype=np.int64,
                count=n,
            )
            nav = is_par & (ntok < short_tokens) & (next_kind == "link")
            out[nav] = "nav"

        doc_ids = batch.column("doc_id").take(
            pa.array(np.repeat(np.arange(len(sizes), dtype=np.int64), sizes))
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "offset": pa.array(offsets),
                "kind": pa.array(kind_arr, pa.string()),
                "label": pa.array(out, pa.string()),
            }
        )

    return corpus_ds.map_batches(label, batch_format="pyarrow")
