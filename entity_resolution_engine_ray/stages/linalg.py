"""Distributed PCA over an embedding column — the dimensionality-reduction
step in front of clustering / ANN indexing at corpus scale.

Covariance factorizes into streaming partials: each batch contributes
``(n, Σx, XᵀX)`` — a d-vector and a d×d matrix, independent of batch row
count — so the fit moves O(batches · d²) bytes and never materializes the
data. The tiny d×d eigendecomposition happens once on the driver; the
projection is a vectorized per-batch matmul against the broadcast
components. Components are sign-normalized (largest-|coord| entry made
positive) so the fit is deterministic across partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(t: pa.Table, col: str) -> np.ndarray:
    emb = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    import pyarrow.compute as pc

    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = int(pc.list_value_length(emb)[0].as_py())
    return flat.reshape(-1, d)


def pca_fit(ds, col: str = "embedding", k: int = 8) -> dict:
    """Fit PCA on ``ds[col]`` (fixed-width ``list<float>``). Returns
    ``{"mean": (d,), "components": (k, d), "explained_var": (k,)}``."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.binary()),
                    "xtx": pa.array([], type=pa.binary()),
                }
            )
        mat = _to_matrix(t, col)
        return pa.table(
            {
                "n": pa.array([mat.shape[0]], type=pa.int64()),
                "s": pa.array([mat.sum(axis=0).tobytes()], type=pa.binary()),
                "xtx": pa.array([(mat.T @ mat).tobytes()], type=pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # a 0-row dataset skips the lazy map entirely and surfaces the SOURCE
    # schema — treat a missing partial column as the empty case
    n = int(parts["n"].sum()) if "n" in parts.columns else 0
    if n == 0:
        raise ValueError("pca_fit: empty dataset")
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s"]], axis=0)
    d = len(s)
    xtx = np.sum(
        [np.frombuffer(b, dtype=np.float64).reshape(d, d) for b in parts["xtx"]], axis=0
    )
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    # deterministic sign: the largest-magnitude coordinate is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps, "explained_var": evals[order]}


def pca_project(ds, model: dict, col: str = "embedding", out_col: str = "pca"):
    """Project every row onto the fitted components: adds ``out_col``
    (``list<float>`` of length k). Model ships ONCE via ``ray.put``."""
    import ray

    model_ref = ray.put((model["mean"], model["components"]))

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.list_(pa.float32())))
        mean, comps = ray.get(model_ref)
        proj = ((_to_matrix(t, col) - mean) @ comps.T).astype(np.float32)
        k = proj.shape[1]
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(proj) + 1) * k, k, dtype=np.int32)),
            pa.array(proj.reshape(-1)),
        )
        return t.append_column(out_col, arr)

    return ds.map_batches(project, batch_format="pyarrow")
