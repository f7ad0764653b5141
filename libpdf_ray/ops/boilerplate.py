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
    shuffle.  The hash set is broadcast once per worker."""
    import pyarrow as pa
    import ray

    from ..schema import SPANS_TYPE

    ref = ray.put(frozenset(boilerplate_hashes))

    class Strip:
        def __init__(self):
            self.hot = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids = batch.column("doc_id").to_pylist()
            spans_col = batch.column("spans").to_pylist()
            new_spans = []
            for spans in spans_col:
                kept = [
                    s
                    for s in spans
                    if not (
                        s["kind"] in kinds and _span_hash(s["text"]) in self.hot
                    )
                ]
                new_spans.append(
                    [{**s, "offset": i} for i, s in enumerate(kept)]
                )
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.string()),
                    "spans": pa.array(new_spans, SPANS_TYPE),
                    "n_spans": pa.array(
                        [len(s) for s in new_spans], pa.int32()
                    ),
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
