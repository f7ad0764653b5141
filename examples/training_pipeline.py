"""Training-data curation cookbook: the ops chained end to end.

Deduplicate → decontaminate → downsample → quality-filter → token budget,
over the driver's documents table — the "LLM training-data pipeline" half
of the engine (COVERAGE.md "Beyond the reference").

Run from the repo root:  python examples/training_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")

import ray.data as rd

from libpdf_ray.ops.dedup import exact_dedup, minhash_lsh_pairs
from libpdf_ray.ops.text import QualityScorer, add_text_stats
from libpdf_ray.ops.util import parquet_row_count, tune_data_context

tune_data_context()

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
docs_path = f"{SF}/documents.parquet"

# 1. exact dedup (hash-partitioned keep-min-id); `source` rides along so
#    the later sampling stage can filter IN-STREAM (the hash is a pure
#    per-row function — no id set ever visits the driver)
ds = rd.read_parquet(docs_path, columns=["doc_id", "text", "lang", "source"])
n_in = ds.count()
deduped = exact_dedup(ds, est_keys=parquet_row_count(docs_path))
n_dedup = deduped.count()

# 2. near-dup pairs (MinHash-LSH) — report, then drop the higher id of
#    each pair (broadcast the small drop set)
pairs = minhash_lsh_pairs(
    rd.read_parquet(docs_path, columns=["doc_id", "text"]), threshold=0.8
).to_pandas()
drop = set(pairs["id_b"])
# vectorized batch mask (a row-wise ds.filter(lambda) would run one Python
# call per document); the drop set is tiny — closure capture ships it once
# per task alongside the UDF
neardup_free = deduped.map_batches(
    lambda df: df[~df["doc_id"].isin(drop)], batch_format="pandas"
)

# 3. benchmark decontamination: drop training docs sharing any word
#    4-gram with the held-out "benchmark" slice (doc_id % 97 == 0 stands
#    in for a real eval set; the benchmark shingle set is broadcast once)
from libpdf_ray.ops.corpus import decontaminate

bench = rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
    lambda df: df[df["doc_id"] % 97 == 0], batch_format="pandas"
)
contaminated = set(
    decontaminate(
        rd.read_parquet(docs_path, columns=["doc_id", "text"]), bench
    ).to_pandas()["doc_id"]
)
clean = neardup_free.map_batches(
    lambda df: df[~df["doc_id"].isin(contaminated)], batch_format="pandas"
)

# 4. deterministic stratified downsample, applied IN-STREAM (exact
#    integer hash of doc_id — a resumed or re-run job keeps the identical
#    sample; nothing is collected driver-side)
import numpy as np

from libpdf_ray.ops.corpus import (
    SAMPLE_BASE_THRESHOLD,
    SAMPLE_BOOST_SOURCES,
    SAMPLE_BOOST_THRESHOLD,
)


def keep_sampled(df):
    h = (df["doc_id"].to_numpy(dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    thr = np.where(
        df["source"].isin(SAMPLE_BOOST_SOURCES),
        SAMPLE_BOOST_THRESHOLD,
        SAMPLE_BASE_THRESHOLD,
    )
    return df[h < thr]


sampled = clean.map_batches(keep_sampled, batch_format="pandas")

# 5. quality filter (actor-pool scorer) + token stats
scored = sampled.map_batches(QualityScorer, batch_format="pandas",
                             concurrency=2)
kept = scored.map_batches(lambda df: df[df["q_keep"]], batch_format="pandas")
stats = kept.map_batches(add_text_stats, batch_format="pandas")

out = stats.map_batches(
    lambda df: df[["doc_id", "lang", "token_count", "q_mean_token_len"]],
    batch_format="pandas",
)
n_kept = out.count()
total_tokens = sum(
    b["token_count"].sum() for b in out.iter_batches(batch_format="pandas")
)

print(
    f"docs in: {n_in} | after exact dedup: {n_dedup} | "
    f"near-dup pairs: {len(pairs)} | contaminated dropped: {len(contaminated)} | "
    f"after sample+quality filter: {n_kept} | "
    f"token budget: {int(total_tokens)}"
)

ray.shutdown()
