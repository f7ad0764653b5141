"""Corpus-level boilerplate detection and stripping.

The intra-document smart page crop (kernels/headerfooter.py) removes
furniture that repeats across a document's pages; this operator is its
corpus-level sibling — the "HTML boilerplate strip" of the north rule:
paragraphs whose exact text recurs across many *documents* (nav bars,
cookie banners, license blurbs) are detected by a grouped count over
content hashes and removed from every document's span list.

Scale shape: ONE shuffle of (hash, doc_id) pairs (never text bodies) with a
per-batch combiner; the resulting boilerplate hash set is tiny and is
broadcast (``ray.put``) into a vectorized filter pass.  Span offsets are
re-densified so the output is again a valid span corpus.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def _span_hash(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "ignore")).hexdigest()


def find_boilerplate_hashes(
    spans_ds,
    min_doc_fraction: float = 0.05,
    min_docs: int = 3,
    kinds: tuple = ("paragraph",),
):
    """Return (the boilerplate hash set, total doc count).

    ``spans_ds`` is the exploded span table (doc_id, kind, text, …).  A
    span text is boilerplate when distinct documents containing it ≥
    max(min_docs, min_doc_fraction · n_docs)."""
    from .util import shuffle_partitions

    # two consumers fan out below (pair counting + the distinct-doc count);
    # without this, Ray re-executes the WHOLE upstream pipeline — including
    # the extraction that produced the spans — once per consumer
    spans_ds = spans_ds.materialize()
    # hash-key cardinality ≤ span rows (count is metadata-only after
    # materialize)
    n_parts = shuffle_partitions(est_keys=spans_ds.count())

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"].isin(kinds) & (df["text"] != "")]
        out = pd.DataFrame(
            {
                "h": [_span_hash(t) for t in df["text"]],
                "doc_id": df["doc_id"],
            }
        ).drop_duplicates()  # per-batch combiner: one (hash, doc) pair
        return out

    pair_ds = spans_ds.map_batches(pairs, batch_format="pandas")
    # distinct docs per hash: per-batch pairs are deduped, but a doc's
    # spans can straddle batches → bucket co-group by hash prefix, then
    # one vectorized drop_duplicates + value_counts per bucket (avoids
    # Ray aggregate on high-cardinality keys AND chained shuffles —
    # BASELINE.md bench notes)
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

    bucketed = pair_ds.map_batches(
        lambda df: df.assign(bucket=[int(h[:4], 16) % (4 * n_parts) for h in df["h"]]),
        batch_format="pandas",
    )
    counts = bucketed.groupby("bucket", num_partitions=n_parts).map_groups(
        count_bucket, batch_format="pandas"
    )
    # distinct doc count without materializing ids on the driver
    total = (
        spans_ds.select_columns(["doc_id"])
        .groupby("doc_id", num_partitions=n_parts)
        .count()
        .count()
    )
    threshold = max(min_docs, int(min_doc_fraction * total))

    def hot_filter(df: pd.DataFrame) -> pd.DataFrame:
        if "h" not in df.columns:  # empty-schema block from empty partition
            return pd.DataFrame(
                {"h": pd.Series([], dtype="object"),
                 "n_docs": pd.Series([], dtype="int64")}
            )
        return df[df["n_docs"] >= threshold][["h", "n_docs"]]

    hot = counts.map_batches(hot_filter, batch_format="pandas").to_pandas()
    if "h" not in hot.columns:  # nothing crossed the threshold
        return set(), total
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
