"""Similarity search over embedding columns.

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch computes a numpy matmul against it and
  emits per-block partial top-k rows; a tiny ``groupby(query_id)`` merge
  produces the global top-k.  The shuffle moves k·n_blocks rows per query,
  never the corpus.
- :func:`knn_ivf` — the scale path: k-means-style coarse quantizer (fit on a
  sample, centroids broadcast) assigns each vector to a cell; queries probe
  only the nearest cells.  For parquet sources the probe prunes the READ
  (cell-partitioned ``ivf_cell=N/`` index, built once per corpus via a
  content-addressed cache): on 10^12 rows a query set touches
  ~(n_probe/n_cells) of the stored bytes.  In-memory datasets fall back to
  an in-stream assign-and-filter (nothing to prune), with a warning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(e, dtype=np.float64) for e in col])


def _empty_knn_frame(queries: dict) -> pd.DataFrame:
    """Zero-row result with id dtypes derived from ``queries['ids']`` (not
    hardcoded int64 — string vec_ids must keep the non-empty schema)."""
    id_dtype = pd.Series(list(queries["ids"])).dtype
    return pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=id_dtype),
            "neighbor_id": pd.Series([], dtype=id_dtype),
            "sim": pd.Series([], dtype="float64"),
        }
    )


class _PartialTopK:
    """Per-batch exact cosine partials against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, exclude_self: bool):
        import ray

        q = ray.get(queries_ref)  # once per actor / task-arg fetch
        self.q_ids = np.asarray(q["ids"])
        qm = np.asarray(q["matrix"], dtype=np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _as_matrix(batch["embedding"])
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ids = batch[self.id_col].to_numpy()
        sims = self.qm @ emb.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            row = sims[qi]
            mask = ids != qid if self.exclude_self else np.ones(len(ids), bool)
            cand = np.where(mask)[0]
            if len(cand) == 0:
                continue
            take = min(self.k, len(cand))
            top = cand[np.argpartition(-row[cand], take - 1)[:take]]
            out_q.extend([qid] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "sim": out_s}
        )


#: below this input size the partial-top-k actor pool + tree merge is
#: skipped: pool spin-up costs ~1-2 s regardless of data, while a single
#: task brute-forces megabyte-scale embedding tables in milliseconds
SINGLE_TASK_KNN_BYTES = 128 * 1024 * 1024


def knn_bruteforce(ds, queries: dict, k: int = 5, id_col: str = "vec_id",
                   exclude_self: bool = True, est_bytes: int | None = None):
    """Exact cosine top-k.  ``queries`` = {"ids": [...], "matrix": ndarray}.

    Returns (query_id, neighbor_id, sim) with sim rounded to 4 decimals and
    deterministic tie-break (sim desc, neighbor_id asc).

    ``est_bytes`` (input file size, when known) small-routes through ONE
    coalesced task — the same partial kernel + merge, no actor pool, no
    tree merge; identical output (pinned by the route-equality test)."""
    import ray

    queries_ref = ray.put(queries)

    if est_bytes is not None and est_bytes <= SINGLE_TASK_KNN_BYTES:
        empty_small = _empty_knn_frame(queries)

        def single(df: pd.DataFrame) -> pd.DataFrame:
            part = _PartialTopK(queries_ref, k, id_col, exclude_self)(df)
            if not len(part):
                return empty_small
            top = (
                part.sort_values(["sim", "neighbor_id"],
                                 ascending=[False, True])
                .groupby("query_id", as_index=False)
                .head(k)
                .copy()
            )
            top["sim"] = top["sim"].round(4)
            return top.sort_values(["query_id", "sim", "neighbor_id"],
                                   ascending=[True, False, True])

        return ds.repartition(1).map_batches(
            single, batch_format="pandas", batch_size=None
        )
    partials = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs={
            "queries_ref": queries_ref,
            "k": k,
            "id_col": id_col,
            "exclude_self": exclude_self,
        },
        batch_format="pandas",
        concurrency=(1, 4),  # autoscaling: shrink on small sessions so chained pools never starve the read
        num_cpus=0.5,  # fractional: a full-CPU pool starves reads on small sessions
    )

    # global merge: ≤ k·n_blocks partial rows per query — per-query
    # sort+head(k) is associative, so the tree merge bounds every task at
    # fan_in blocks (a groupby shuffle here is overkill and trips on empty
    # partial blocks).  Capture only the tiny empty frame, not `queries`
    # (the query MATRIX must never ride in a task closure).
    empty = _empty_knn_frame(queries)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if "query_id" not in df.columns or not len(df):
            return empty
        top = (
            df.sort_values(["sim", "neighbor_id"], ascending=[False, True])
            .groupby("query_id", as_index=False)
            .head(k)
            .copy()
        )
        top["sim"] = top["sim"].round(4)
        return top.sort_values(["query_id", "sim", "neighbor_id"],
                               ascending=[True, False, True])

    from .util import tree_merge

    return tree_merge(partials, merge)


class _IVFAssign:
    def __init__(self, centroids_ref):
        import ray

        c = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        self.c = c / np.linalg.norm(c, axis=1, keepdims=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = _as_matrix(batch["embedding"])
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        batch["ivf_cell"] = np.argmax(emb_n @ self.c.T, axis=1).astype("int64")
        return batch


def ivf_fit_centroids(ds, n_cells: int = 16, sample_rows: int = 2048,
                      iters: int = 8, seed: int = 42) -> np.ndarray:
    """Coarse quantizer fit on a driver-side sample (the sample is small and
    bounded; the corpus itself is never materialized)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = _as_matrix(sample["embedding"])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)
    return centroids


def ivf_build_index(ds, centroids: np.ndarray, out_dir: str,
                    id_col: str = "vec_id") -> str:
    """Write the corpus as CELL-PARTITIONED parquet (hive layout
    ``ivf_cell=<n>/``) so that probing prunes **I/O**, not just compute.

    With this index a query set reads only ``n_probe / n_cells`` of the
    bytes from storage (:func:`knn_ivf_partitioned` — the default route of
    :func:`knn_ivf` for parquet sources).  Build cost is one full pass +
    one partitioned write — amortized over every subsequent query set."""
    import ray

    centroids_ref = ray.put(centroids)
    assigned = ds.map_batches(
        _IVFAssign,
        fn_constructor_kwargs={"centroids_ref": centroids_ref},
        batch_format="pandas",
        concurrency=(1, 4),  # autoscaling: shrink on small sessions so chained pools never starve the read
        num_cpus=0.5,
    )

    def arrow_safe(df: pd.DataFrame) -> pd.DataFrame:
        # pandas holds list<float> cells as numpy arrays, which the Arrow
        # write path cannot re-infer — re-wrap as plain lists
        df = df.copy()
        df["embedding"] = [list(map(float, e)) for e in df["embedding"]]
        return df

    assigned.map_batches(arrow_safe, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["ivf_cell"]
    )
    return out_dir


def _probe_cells(queries: dict, centroids: np.ndarray, n_probe: int) -> list:
    """The union of every query's ``n_probe`` nearest cells (sorted)."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qm = np.asarray(queries["matrix"], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]
    return sorted({int(c) for row in probe for c in row})


def _probed_cell_paths(index_dir: str, probed_cells) -> list:
    """Parquet files of the probed cells ONLY — dir-level partition
    pruning: unprobed cells' bytes never leave storage."""
    import glob
    import os

    return [
        f
        for c in probed_cells
        for f in sorted(
            glob.glob(os.path.join(index_dir, f"ivf_cell={c}", "*.parquet"))
        )
    ]


def _is_ivf_index_dir(path: str) -> bool:
    import glob
    import os

    return os.path.isdir(path) and bool(
        glob.glob(os.path.join(path, "ivf_cell=*"))
    )


def ivf_centroids_for(src_path: str, n_cells: int = 16,
                      sample_rows: int = 2048, iters: int = 8,
                      seed: int = 42, cache_root: str = "/tmp") -> np.ndarray:
    """Fit-or-reuse coarse-quantizer centroids for a parquet source.

    Same amortization as :func:`ivf_index_for`: the fit is deterministic
    given (source bytes, params), so repeated query sets over one corpus
    pay the sample scan once — the cached ``.npy`` is keyed by (abspath,
    mtime, size, params) and published with one atomic rename."""
    import hashlib
    import os

    from .util import read_sized

    st = os.stat(src_path)
    key = hashlib.md5(
        f"{os.path.abspath(src_path)}:{st.st_mtime_ns}:{st.st_size}"
        f":c{n_cells}:s{sample_rows}:i{iters}:r{seed}".encode()
    ).hexdigest()[:12]
    path = os.path.join(cache_root, f"libpdf_ray_ivfc_{key}.npy")
    if os.path.exists(path):
        try:
            cached = np.load(path)  # allow_pickle=False: no code execution
        except Exception:
            cached = None  # truncated/planted file: refit and overwrite
        # shape/dtype sanity — /tmp is shared, never trust blindly
        if (
            cached is not None
            and cached.ndim == 2
            and 1 <= cached.shape[0] <= n_cells
            and cached.dtype == np.float64
            and np.isfinite(cached).all()
        ):
            return cached
    ds = read_sized(src_path, columns=["embedding"])
    centroids = ivf_fit_centroids(
        ds, n_cells=n_cells, sample_rows=sample_rows, iters=iters, seed=seed
    )
    tmp = f"{path}.tmp-{os.getpid()}.npy"  # np.save appends .npy otherwise
    np.save(tmp, centroids)
    os.replace(tmp, path)  # atomic; concurrent fitters write identical bytes
    return centroids


def ivf_index_for(src_path: str, centroids: np.ndarray,
                  id_col: str = "vec_id", columns: list | None = None,
                  cache_root: str = "/tmp") -> str:
    """Build (or reuse) the cell-partitioned index for a parquet source.

    Content-addressed cache: the index dir is keyed by (abspath, mtime,
    size, centroid bytes), so a changed source or quantizer rebuilds while
    repeated query sets over the same corpus reuse one build — the
    amortization that makes the partitioned path the default."""
    import hashlib
    import os

    from .util import read_sized

    st = os.stat(src_path)
    # key covers EVERYTHING that shapes the built index: source identity,
    # quantizer, and the id/column projection (two callers differing only
    # in id_col must not share one cached build)
    col_sig = ",".join(columns or [id_col, "embedding"])
    key = hashlib.md5(
        f"{os.path.abspath(src_path)}:{st.st_mtime_ns}:{st.st_size}"
        f":{id_col}:{col_sig}".encode()
        + np.ascontiguousarray(centroids, dtype=np.float64).tobytes()
    ).hexdigest()[:12]
    index_dir = os.path.join(cache_root, f"libpdf_ray_ivf_{key}")
    marker = os.path.join(index_dir, "_built")
    if not os.path.exists(marker):
        # build into a private temp dir and publish with ONE atomic rename:
        # concurrent builders (repeated query sets against a fresh corpus)
        # each build their own candidate and exactly one wins — never two
        # writers interleaving part files into the same live dir
        import uuid

        tmp_dir = f"{index_dir}.build-{uuid.uuid4().hex[:8]}"
        ivf_build_index(
            read_sized(src_path, columns=columns or [id_col, "embedding"]),
            centroids,
            tmp_dir,
            id_col=id_col,
        )
        with open(os.path.join(tmp_dir, "_built"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(tmp_dir, index_dir)
        except OSError:
            import shutil

            if os.path.exists(marker):
                # a concurrent builder won the rename; use theirs
                shutil.rmtree(tmp_dir, ignore_errors=True)
            else:
                # index_dir exists but is NOT a complete build (stale
                # crash debris / external interference): replace it with
                # the fresh complete build instead of returning a broken
                # dir that would silently yield empty probes forever
                shutil.rmtree(index_dir, ignore_errors=True)
                os.rename(tmp_dir, index_dir)
    return index_dir


def knn_ivf_partitioned(index_dir: str, queries: dict, centroids: np.ndarray,
                        k: int = 5, n_probe: int = 4, id_col: str = "vec_id",
                        exclude_self: bool = True):
    """Approximate top-k over a cell-partitioned index: reads ONLY the
    probed cells' files (dir-level partition pruning at the read — the
    10^12-row shape: a query set touches ``n_probe / n_cells`` of the
    stored bytes)."""
    import ray.data as rd

    paths = _probed_cell_paths(index_dir, _probe_cells(queries, centroids, n_probe))
    if not paths:
        # every probed cell is unpopulated (k-means keeps empty centroids on
        # small/skewed corpora) — the result is legitimately empty
        return rd.from_pandas(_empty_knn_frame(queries))
    subset = rd.read_parquet(paths, columns=[id_col, "embedding"])
    return knn_bruteforce(subset, queries, k=k, id_col=id_col,
                          exclude_self=exclude_self)


def knn_ivf(source, queries: dict, centroids: np.ndarray, k: int = 5,
            n_probe: int = 4, id_col: str = "vec_id", exclude_self: bool = True):
    """THE ANN entry point — one path, probe-pruned at the read.

    ``source`` routing:

    - an ``ivf_cell=N/`` index dir (str) → probe the partitioned index
      directly (:func:`knn_ivf_partitioned`);
    - a parquet file/dir (str) → build the index ONCE into a
      content-addressed cache (:func:`ivf_index_for`), then probe it —
      repeated query sets over the same corpus pay the build once and
      read only probed cells afterwards;
    - an in-memory ``Dataset`` → in-stream fallback: assign every vector
      and filter to the probed cells.  There is no storage to prune for a
      from-memory dataset, so this full-corpus assignment is the only
      option — it is the SMALL-data convenience form, never the scale
      path, and it logs a warning saying so.

    All three forms produce identical output for the same
    (corpus, centroids, queries, n_probe) — pinned by
    ``tests/test_ops.py::TestIVFPartitioned``."""
    if isinstance(source, str):
        index_dir = (
            source
            if _is_ivf_index_dir(source)
            else ivf_index_for(source, centroids, id_col=id_col)
        )
        return knn_ivf_partitioned(
            index_dir, queries, centroids, k=k, n_probe=n_probe,
            id_col=id_col, exclude_self=exclude_self,
        )

    import logging

    import ray

    logging.getLogger(__name__).warning(
        "knn_ivf: in-memory Dataset source — falling back to the in-stream "
        "assign-and-filter path (scans the full corpus per query set). "
        "Pass a parquet path or an ivf_cell=N/ index dir to get "
        "probe-pruned reads."
    )
    centroids_ref = ray.put(centroids)
    assigned = source.map_batches(
        _IVFAssign,
        fn_constructor_kwargs={"centroids_ref": centroids_ref},
        batch_format="pandas",
        concurrency=(1, 4),  # autoscaling: shrink on small sessions so chained pools never starve the read
        num_cpus=0.5,
    )
    probed_cells = frozenset(_probe_cells(queries, centroids, n_probe))
    # pandas-side filter: an expression filter would round-trip the
    # embedding column through Arrow, and pandas batches store it as a
    # tensor-ish object dtype that Arrow cannot re-infer
    subset = assigned.map_batches(
        lambda df: df[df["ivf_cell"].isin(probed_cells)],
        batch_format="pandas",
    )
    return knn_bruteforce(subset, queries, k=k, id_col=id_col,
                          exclude_self=exclude_self)


def kmeans_fit(ds, n_clusters: int, iters: int = 10, seed: int = 42,
               init: np.ndarray | None = None) -> dict:
    """Distributed Lloyd k-means over the FULL corpus (spherical: vectors
    and centroids are L2-normalized, assignment by max cosine).

    Each iteration is one streaming pass: centroids ride to every batch
    via ``ray.put``, each batch emits per-cluster PARTIAL (sum-vector,
    count) rows — k rows per block, independent of block size — and one
    tree merge produces the k new centroids driver-side (k·dim floats,
    kilobytes).  The corpus is never collected, sorted, or shuffled; at
    10^12 rows the per-iteration exchange is still k rows per block.
    Complements :func:`ivf_fit_centroids` (sample-based, zero-pass): use
    this when the quantizer must see every vector.

    Returns {"centroids": (k, dim) ndarray, "inertia": [per-iter mean
    cosine to assigned centroid], "n": total rows}.  Seeding is
    deterministic for a fixed ``seed``/``init``; the per-cluster double
    sums associate in block order, so centroids can differ at float-noise
    level (~1e-15) across block layouts — inherent to any distributed
    float reduction, and why this op is tested against a single-process
    reference rather than a SQL hash oracle."""
    import ray

    from .util import tree_merge

    if init is not None:
        centroids = np.asarray(init, dtype=np.float64)
    else:
        # deterministic seeding from a bounded sample (same discipline as
        # ivf_fit_centroids: the sample is small; the fit below is
        # full-pass).  Farthest-point (k-means++-style, greedy): random
        # seeding regularly drops two centroids into one cluster, which
        # Lloyd cannot escape
        sample = ds.limit(max(n_clusters * 64, 256)).to_pandas()
        x = _as_matrix(sample["embedding"])
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        chosen = [int(rng.integers(len(x)))]
        while len(chosen) < min(n_clusters, len(x)):
            best_sim = np.max(x @ x[chosen].T, axis=1)
            best_sim[chosen] = np.inf  # never re-pick
            chosen.append(int(np.argmin(best_sim)))
        centroids = x[chosen].copy()
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    k, dim = centroids.shape
    inertia: list = []
    n_total = 0

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = np.asarray(ray.get(cref))
            emb = _as_matrix(df["embedding"])
            emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = emb @ c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(emb)), assign]
            rows = []
            for cell in np.unique(assign):
                m = assign == cell
                rows.append(
                    {
                        "cell": int(cell),
                        "vsum": emb[m].sum(axis=0).tolist(),
                        "n": int(m.sum()),
                        "sim_sum": float(best[m].sum()),
                    }
                )
            return pd.DataFrame(rows)

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            out = []
            for cell, g in df.groupby("cell"):
                out.append(
                    {
                        "cell": int(cell),
                        "vsum": np.sum(
                            np.stack([np.asarray(v) for v in g["vsum"]]), axis=0
                        ).tolist(),
                        "n": int(g["n"].sum()),
                        "sim_sum": float(g["sim_sum"].sum()),
                    }
                )
            return pd.DataFrame(out)

        stats = tree_merge(
            ds.map_batches(partial, batch_format="pandas"), merge
        ).to_pandas()
        n_total = int(stats["n"].sum())
        inertia.append(float(stats["sim_sum"].sum()) / max(n_total, 1))
        new_c = centroids.copy()
        for _, row in stats.iterrows():
            v = np.asarray(row["vsum"], dtype=np.float64)
            nrm = np.linalg.norm(v)
            if nrm > 0:
                new_c[int(row["cell"])] = v / nrm
        centroids = new_c

    return {"centroids": centroids, "inertia": inertia, "n": n_total}
