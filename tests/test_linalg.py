"""Distributed PCA vs a serial numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(mat: np.ndarray) -> pa.Table:
    n, d = mat.shape
    arr = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
        pa.array(mat.reshape(-1).astype(np.float32)),
    )
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)), "embedding": arr})


def test_pca_matches_numpy_and_is_partitioning_invariant(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.linalg import pca_fit, pca_project

    rng = np.random.default_rng(13)
    # anisotropic data: distinct spectrum so eigenvectors are unique up to sign
    basis, _ = np.linalg.qr(rng.normal(size=(16, 16)))
    scales = np.linspace(8, 0.5, 16)
    mat = (rng.normal(size=(3000, 16)) * scales) @ basis.T + rng.normal(size=16)
    mat = mat.astype(np.float32).astype(np.float64)  # match list<float> storage

    k = 4
    ds = rd.from_arrow(_emb_table(mat)).repartition(7)
    model = pca_fit(ds, k=k)

    # serial oracle on the same float32-quantized data
    mean = mat.mean(axis=0)
    cov = (mat - mean).T @ (mat - mean) / len(mat)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    want = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(want[i])))
        if want[i, j] < 0:
            want[i] = -want[i]

    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(model["components"], want, atol=1e-7)
    np.testing.assert_allclose(model["explained_var"], evals[order], atol=1e-7)

    # partitioning invariance of the fit (partials merge by addition)
    model3 = pca_fit(rd.from_arrow(_emb_table(mat)).repartition(3), k=k)
    np.testing.assert_allclose(model["components"], model3["components"], atol=1e-9)

    # projection: vs direct matmul, and variance actually concentrates
    out = (
        pca_project(ds, model)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got_proj = np.vstack(out["pca"].to_numpy())
    want_proj = ((mat - mean) @ want.T).astype(np.float32)
    np.testing.assert_allclose(got_proj, want_proj, atol=1e-4)
    var = got_proj.astype(np.float64).var(axis=0)
    assert (np.diff(var) <= 1e-6).all()  # decreasing variance per component


def test_pca_empty_raises(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.linalg import pca_fit

    empty = _emb_table(np.zeros((0, 4)))
    with pytest.raises(ValueError):
        pca_fit(rd.from_arrow(empty), k=2)


def test_reciprocal_topk_blocked_equals_single_block(ray_session):
    """reciprocal_topk_pairs must be block-count invariant: tiny chunks
    (many cross-block candidate tasks) == one-block result == numpy mutual
    top-k oracle."""
    import pandas as pd
    import ray.data as rd

    from entity_resolution_engine_ray.stages.knn import reciprocal_topk_pairs

    rng = np.random.default_rng(7)
    n, d, k = 120, 8, 5
    mat = rng.standard_normal((n, d))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [list(r) for r in mat]}
    )

    def collect(ds):
        out = ds.to_pandas()
        return out.sort_values(["left_id", "right_id"], kind="mergesort").reset_index(
            drop=True
        )

    one = collect(reciprocal_topk_pairs(rd.from_pandas(pdf), k=k, chunk=4096))
    many = collect(reciprocal_topk_pairs(rd.from_pandas(pdf), k=k, chunk=17))
    pd.testing.assert_frame_equal(one, many)

    # numpy oracle
    mn = (mat.T / np.linalg.norm(mat, axis=1)).T
    c = mn @ mn.T
    p = 1e4
    cr = np.where(c >= 0, np.floor(c * p + 0.5), np.ceil(c * p - 0.5)) / p
    np.fill_diagonal(cr, -np.inf)
    tops = [set(np.lexsort((np.arange(n), -cr[i]))[:k]) for i in range(n)]
    want = sorted(
        (i, j) for i in range(n) for j in tops[i] if i < j and i in tops[j]
    )
    got = list(map(tuple, one[["left_id", "right_id"]].values.tolist()))
    assert got == want


def test_reciprocal_ivf_agrees_with_exact_on_clustered_data(ray_session):
    """Paths-agree pin: the IVF candidate path must reproduce the exact
    mutual top-k result on clustered embeddings (the regime IVF is FOR —
    tight clusters, neighbors share a centroid list). Deterministic:
    seeded fixture, seeded centroids."""
    import pandas as pd
    import ray.data as rd

    from entity_resolution_engine_ray.stages.knn import reciprocal_topk_pairs

    rng = np.random.default_rng(11)
    n_clusters, per, d, k = 12, 25, 16, 5
    centers = rng.standard_normal((n_clusters, d)) * 4
    mat = np.concatenate(
        [centers[i] + 0.05 * rng.standard_normal((per, d)) for i in range(n_clusters)]
    )
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(mat), dtype=np.int64), "embedding": [list(r) for r in mat]}
    )

    def collect(ds):
        out = ds.to_pandas()
        return out.sort_values(["left_id", "right_id"], kind="mergesort").reset_index(
            drop=True
        )

    exact = collect(reciprocal_topk_pairs(rd.from_pandas(pdf), k=k, method="exact"))
    ivf = collect(
        reciprocal_topk_pairs(
            rd.from_pandas(pdf), k=k, method="ivf", n_centroids=24, n_assign=2, n_iters=3
        )
    )
    pd.testing.assert_frame_equal(exact, ivf)
    assert len(exact) > 0


def test_reciprocal_empty_input(ray_session):
    """ADVICE r3: an empty embedding dataset must return an empty typed
    result, not crash in _norm_block (np.arange step-0 ZeroDivisionError)."""
    import ray.data as rd

    from entity_resolution_engine_ray.stages.knn import (
        cosine_all_pairs_exact,
        reciprocal_topk_pairs,
    )

    empty = _emb_table(np.zeros((0, 4)))
    out = reciprocal_topk_pairs(rd.from_arrow(empty), k=3)
    assert out.count() == 0
    assert set(out.schema().names) == {"left_id", "right_id", "cos"}
    out2 = cosine_all_pairs_exact(rd.from_arrow(empty))
    assert out2.count() == 0


def test_kmeans_assign_separates_clusters_and_is_partition_invariant(ray_session):
    """kmeans_assign on three well-separated direction clusters: every
    generated cluster maps to ONE label, labels are distinct across
    clusters, and the assignment is invariant to input partitioning.
    Empty input returns a typed empty Dataset."""
    import pandas as pd
    import ray.data as rd

    from entity_resolution_engine_ray.stages.knn import kmeans_assign

    rng = np.random.default_rng(11)
    centers = np.eye(3, 8) * 10.0
    mat = np.vstack([c + 0.05 * rng.standard_normal((40, 8)) for c in centers])
    truth = np.repeat(np.arange(3), 40)
    tbl = _emb_table(mat)

    def collect(ds):
        out = ds.to_pandas().sort_values("vec_id", kind="mergesort").reset_index(drop=True)
        return out

    a = collect(kmeans_assign(rd.from_arrow(tbl), n_clusters=3, n_iters=10))
    b = collect(
        kmeans_assign(rd.from_arrow(tbl).repartition(7), n_clusters=3, n_iters=10)
    )
    pd.testing.assert_frame_equal(a, b)
    lab = a["cluster"].to_numpy()
    for g in range(3):
        assert len(set(lab[truth == g])) == 1, f"cluster {g} fragmented"
    assert len({lab[truth == g][0] for g in range(3)}) == 3, "clusters merged"

    empty = kmeans_assign(rd.from_arrow(_emb_table(np.zeros((0, 8)))), n_clusters=4)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"vec_id", "cluster"}
