"""Resume semantics: a killed partitioned run skips completed partitions."""

import glob
import json
import os

import pytest

from libpdf_ray.config import SMART_CROP_CONFIG
from libpdf_ray.pipelines.checkpoint import (
    completed_partitions,
    plan_partitions,
    run_resumable,
)


def test_kill_and_resume(ray_session, small_corpus_dir, tmp_path):
    out_dir = str(tmp_path / "out")

    # first attempt dies after 2 of 4 partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            small_corpus_dir, out_dir, SMART_CROP_CONFIG, fail_after_partitions=2
        )
    done = completed_partitions(out_dir)
    assert len(done) == 2

    # record output mtimes of completed partitions
    mtimes = {}
    for part_id in done:
        for f in glob.glob(os.path.join(out_dir, f"part-{part_id}", "*.parquet")):
            mtimes[f] = os.path.getmtime(f)

    # resume completes the rest without touching finished output
    summary = run_resumable(small_corpus_dir, out_dir, SMART_CROP_CONFIG)
    assert sorted(summary["skipped"]) == sorted(done)
    assert len(summary["ran"]) == 2
    for f, old in mtimes.items():
        assert os.path.getmtime(f) == old, f"recomputed completed partition file {f}"

    # manifests carry lineage + metrics
    m = json.load(
        open(sorted(glob.glob(os.path.join(out_dir, "_manifest", "*.json")))[0])
    )
    assert m["input_files"] and m["n_docs"] > 0 and m["n_spans"] > 0
    assert m["wall_time_s"] > 0

    # final output covers every input doc exactly once
    import pyarrow.parquet as pq

    doc_ids = []
    for f in glob.glob(os.path.join(out_dir, "part-*", "*.parquet")):
        doc_ids.extend(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
    in_ids = []
    for f in glob.glob(os.path.join(small_corpus_dir, "part-*.parquet")):
        in_ids.extend(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
    assert sorted(doc_ids) == sorted(in_ids)


def test_plan_partitions(small_corpus_dir):
    plan = plan_partitions(small_corpus_dir)
    assert len(plan) == 4
    assert all(len(files) == 1 for _, files in plan)


def test_torn_manifest_treated_as_incomplete(tmp_path):
    out_dir = str(tmp_path / "out")
    os.makedirs(os.path.join(out_dir, "_manifest"))
    with open(os.path.join(out_dir, "_manifest", "part-0000.json"), "w") as fh:
        fh.write('{"part_id": "0000", "n_docs"')  # torn write
    assert completed_partitions(out_dir) == {}
