"""Similarity search over embedding columns (list<float>).

- ``knn_brute_force`` — exact cosine top-k against a broadcast query matrix:
  per-batch numpy matmul + partial top-k inside ``map_batches``, tiny global
  merge on the driver. The baseline; scales linearly and embarrassingly.
- ``srp_signatures`` / ``cosine_near_dup_pairs`` — the scale path: signed
  random projections (SRP-LSH, Charikar 2002) bucket similar vectors; pairs
  within buckets are verified with exact cosine. Deterministic seeded
  hyperplanes → identical buckets on every worker.
- ``knn_ivf`` — inverted-file variant: vectors are assigned to the nearest
  of C unit centroids; queries probe the nearest ``n_probe`` centroid lists
  only. ``n_iters>0`` refines the seeded random centroids with distributed
  Lloyd k-means passes (``kmeans_refine_centroids`` — per-batch partial
  sums, driver folds a C×d table) before indexing.
- ``cosine_all_pairs_exact`` — exact all-pairs cosine (blocked distributed
  matmul), the oracle-checkable brute-force twin of the SRP-LSH path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_engine_ray.stages.grouping import partition_map_groups

_SRP_SEED = 0xA11CE


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    d = offsets[1] - offsets[0]
    return flat.reshape(len(col), d)


def knn_brute_force(ds, query: np.ndarray, k: int, id_col: str = "vec_id", exclude_ids=frozenset()):
    """Exact cosine top-k. Returns a pandas DataFrame (id_col, cos)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    exclude = set(exclude_ids)

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qn) / norms
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if exclude:
            mask = ~np.isin(ids, list(exclude))
            cos, ids = cos[mask], ids[mask]
        # partial top-k: sort by (-cos, id)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {id_col: pa.array(ids[order], type=pa.int64()), "cos": pa.array(cos[order], type=pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort").head(k)
    return out.reset_index(drop=True)


def srp_signatures(m: np.ndarray, planes: np.ndarray, band_bits: int) -> np.ndarray:
    """Sign-random-projection band keys: (n, n_bands) int64."""
    bits = (m @ planes.T) > 0  # (n, nbits)
    nbits = planes.shape[0]
    n_bands = nbits // band_bits
    out = np.zeros((m.shape[0], n_bands), dtype=np.int64)
    for b in range(n_bands):
        chunk = bits[:, b * band_bits : (b + 1) * band_bits]
        key = np.zeros(m.shape[0], dtype=np.int64)
        for i in range(band_bits):
            key = key * 2 + chunk[:, i]
        out[:, b] = key * np.int64(97) + np.int64(b)  # band id mixed in
    return out


def cosine_near_dup_pairs(
    ds,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nbits: int = 64,
    band_bits: int = 8,
    dim: int | None = None,
    max_block_size: int = 512,
    num_partitions: int = 32,
    broadcast_limit_bytes: int = 256 << 20,
):
    """SRP-LSH bucketed near-duplicate pairs with exact cosine verification.

    band_bits=8, 8 bands: P(bucket match) = (1 - θ/π)^8 per band; at
    cos=0.95 (θ≈18°) ≈ 0.43/band → ≥98% recall over 8 bands."""
    feats = ds.materialize()

    def sig_batch(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        # seeded per call → identical hyperplanes on every worker
        planes_local = np.random.default_rng(_SRP_SEED).standard_normal((nbits, m.shape[1]))
        keys = srp_signatures(m, planes_local, band_bits)
        n, nb = keys.shape
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, nb), type=pa.int64()),
                "block_key": pa.array(keys.reshape(-1), type=pa.int64()),
            }
        )

    block_rows = feats.map_batches(sig_batch, batch_format="pyarrow")

    from entity_resolution_engine_ray.stages.dedup import _dedup_pairs, _pairs_partition
    from entity_resolution_engine_ray.stages.exchange import hash_exchange_cogroup

    raw = partition_map_groups(
        block_rows, ["block_key"], lambda p: _pairs_partition(p, max_block_size), num_partitions
    ).materialize()
    # dropped-pair count BEFORE dedup (dropped values don't survive dedup)
    dropped = int(raw.sum("dropped") or 0)
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "cosine_near_dup_pairs: %d candidate pairs dropped by bucket cap %d",
            dropped,
            max_block_size,
        )
    pairs = partition_map_groups(
        raw.drop_columns(["dropped"]), ["left_id", "right_id"], _dedup_pairs, num_partitions
    )

    # verify = exact cosine per candidate pair. Two physical plans, gated on
    # the embedding-matrix footprint (rows × dim × 8 bytes):
    # - small side (≤ broadcast_limit_bytes): normalize once, ray.put the
    #   matrix, einsum per pair batch — one pass, no extra exchange.
    # - large side: two hash cogroups (pairs.left_id × emb.id, then
    #   pairs.right_id × emb.id) — the matrix is never materialized whole;
    #   each partition ships only the vectors its pairs reference. This is
    #   the only path that can run at 100 TB; the gate makes it impossible
    #   to broadcast a matrix that doesn't fit.
    n_rows = feats.count()
    first = feats.take(1)
    dim_actual = len(first[0]["embedding"]) if first else (dim or 0)
    if n_rows * max(dim_actual, 1) * 8 <= broadcast_limit_bytes:
        import ray

        emb_pdf = feats.to_pandas()
        ids = emb_pdf[id_col].to_numpy()
        m = np.vstack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = (m.T / norms).T
        row_of = {int(i): r for r, i in enumerate(ids)}
        mn_ref = ray.put(mn)
        row_ref = ray.put(row_of)

        def verify_broadcast(pdf: pd.DataFrame) -> pd.DataFrame:
            mat = ray.get(mn_ref)
            rows = ray.get(row_ref)
            li = pdf["left_id"].to_numpy()
            ri = pdf["right_id"].to_numpy()
            lrow = np.fromiter((rows[int(i)] for i in li), dtype=np.int64, count=len(li))
            rrow = np.fromiter((rows[int(i)] for i in ri), dtype=np.int64, count=len(ri))
            cos = np.round(np.einsum("ij,ij->i", mat[lrow], mat[rrow]), 6)
            out = pdf.assign(cos=cos)
            return out[out["cos"] >= threshold][["left_id", "right_id", "cos"]]

        return pairs.map_batches(verify_broadcast, batch_format="pandas")

    def norm_rows(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = (m.T / norms).T
        return pa.table(
            {
                "id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), type=pa.int64()
                ),
                "emb": pa.array(list(mn), type=pa.list_(pa.float64())),
            }
        )

    emb_norm = feats.map_batches(norm_rows, batch_format="pyarrow")

    def attach(col_from: str, col_to: str):
        def fn(pairs_pdf: pd.DataFrame, emb_pdf: pd.DataFrame) -> pd.DataFrame:
            if pairs_pdf.empty:
                out = pairs_pdf.copy()
                out[col_to] = pd.Series([], dtype=object)
                return out
            m = pairs_pdf.merge(
                emb_pdf.rename(columns={"emb": col_to}), left_on=col_from, right_on="id", how="inner"
            )
            return m.drop(columns=["id"])

        return fn

    with_left = hash_exchange_cogroup(
        pairs, emb_norm, ["left_id"], ["id"], attach("left_id", "emb_l"), num_partitions
    )
    with_both = hash_exchange_cogroup(
        with_left, emb_norm, ["right_id"], ["id"], attach("right_id", "emb_r"), num_partitions
    )

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype=np.int64),
                    "right_id": pd.Series([], dtype=np.int64),
                    "cos": pd.Series([], dtype=np.float64),
                }
            )
        ml = np.vstack(pdf["emb_l"].to_numpy())
        mr = np.vstack(pdf["emb_r"].to_numpy())
        cos = np.round(np.einsum("ij,ij->i", ml, mr), 6)
        out = pdf.assign(cos=cos)
        return out[out["cos"] >= threshold][["left_id", "right_id", "cos"]]

    return with_both.map_batches(verify, batch_format="pandas")


def cosine_all_pairs_exact(ds, id_col: str = "vec_id", threshold: float = 0.95):
    """EXACT all-pairs cosine ≥ threshold — the distributed brute-force
    baseline (and the oracle-checkable twin of ``cosine_near_dup_pairs``).

    Blocks of normalized vectors are materialized once; every block PAIR
    becomes one Ray task computing a single (nᵢ × nⱼ) matmul and emitting
    the surviving (left_id, right_id, cos) rows with left_id < right_id.
    O(n²) work split across B(B+1)/2 embarrassingly-parallel tasks — the
    honest exact baseline for corpora where n² compute is affordable; the
    SRP-LSH path (``cosine_near_dup_pairs``) is the sub-quadratic scale
    path. Returns a Dataset (left_id:int64, right_id:int64, cos:float64
    rounded to 4 — DuckDB ROUND semantics)."""
    import ray
    import ray.data as rd

    def norm_block(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = (m.T / norms).T
        d = mn.shape[1] if mn.size else 0
        offsets = pa.array(np.arange(0, (len(mn) + 1) * d, d, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(mn.ravel(), type=pa.float64()))
        return pa.table(
            {
                "id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), type=pa.int64()
                ),
                "emb": emb,
            }
        )

    normed = ds.map_batches(norm_block, batch_format="pyarrow").materialize()
    # Task count is quadratic in block count — coalesce small inputs so each
    # block carries ~CHUNK rows (64-dim f64 ⇒ ~8 MB/block at 16k). A tiny
    # corpus becomes ONE matmul task; a big one keeps B(B+1)/2 ≈
    # (n/CHUNK)²/2 embarrassingly-parallel tasks of bounded memory.
    CHUNK = 16384
    n_rows = normed.count()
    target_blocks = max(1, -(-n_rows // CHUNK))
    if normed.num_blocks() > target_blocks:
        normed = normed.repartition(target_blocks).materialize()
    blocks = normed.to_arrow_refs()

    @ray.remote(num_returns=2)
    def _pair_task(ta: pa.Table, tb: pa.Table, same: bool):
        ia = ta["id"].to_numpy(zero_copy_only=False)
        ib = tb["id"].to_numpy(zero_copy_only=False)
        ma = _to_matrix(ta["emb"])
        mb = _to_matrix(tb["emb"])
        c = ma @ mb.T
        mask = c >= threshold
        if same:
            mask &= np.tri(len(ia), len(ib), k=-1, dtype=bool).T  # strict upper
        ri, ci = np.nonzero(mask)
        l, r = ia[ri], ib[ci]
        cos = c[ri, ci]
        swap = l > r
        l2 = np.where(swap, r, l)
        r2 = np.where(swap, l, r)
        keep = l2 != r2  # self-pairs across duplicate ids
        # round-half-away to 4 (DuckDB ROUND): absorbs summation-order ulps
        p = 10.0**4
        cr = np.where(cos >= 0, np.floor(cos * p + 0.5), np.ceil(cos * p - 0.5)) / p
        out = pa.table(
            {
                "left_id": pa.array(l2[keep].astype(np.int64), type=pa.int64()),
                "right_id": pa.array(r2[keep].astype(np.int64), type=pa.int64()),
                "cos": pa.array(cr[keep], type=pa.float64()),
            }
        )
        return out, out.num_rows

    results, counts = [], []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            t_ref, c_ref = _pair_task.remote(blocks[i], blocks[j], i == j)
            results.append(t_ref)
            counts.append(c_ref)
    n_rows = ray.get(counts)
    keep = [r for r, n in zip(results, n_rows) if n > 0]
    if not keep:
        keep = [results[0]] if results else []
    if not keep:
        return rd.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], type=pa.int64()),
                    "right_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        )
    return rd.from_arrow_refs(keep)


def kmeans_refine_centroids(
    ds, cents: np.ndarray, n_iters: int, batch_size: int = 4096
) -> np.ndarray:
    """Lloyd iterations over a Dataset of normalized embeddings, expressed
    as ``map_batches`` partial sums: each batch emits (centroid, sum-vector,
    count) partials — C×d floats per batch, never the vectors — and the
    driver folds the tiny partial table into new unit centroids. Empty
    centroids keep their previous position. Deterministic for a fixed
    input."""
    C, d = cents.shape
    for _ in range(n_iters):
        current = cents

        def partial(t: pa.Table) -> pa.Table:
            m = _to_matrix(t["embedding"])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            mn = (m.T / norms).T
            assign = np.argmax(mn @ current.T, axis=1)
            sums = np.zeros((C, d), dtype=np.float64)
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=C).astype(np.int64)
            return pa.table(
                {
                    "c": pa.array(np.arange(C), type=pa.int64()),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "n": pa.array(counts, type=pa.int64()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
        sums = np.zeros((C, d), dtype=np.float64)
        counts = np.zeros(C, dtype=np.int64)
        for c, s, n in zip(agg["c"], agg["sum"], agg["n"]):
            sums[c] += np.asarray(s)
            counts[c] += n
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1)
        norms[norms == 0] = 1.0
        cents = (new.T / norms).T
    return cents


def knn_ivf(
    ds,
    query: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = _SRP_SEED,
    n_iters: int = 0,
):
    """IVF top-k: assign vectors to unit centroids, probe the ``n_probe``
    centroid lists nearest the query. ``n_iters=0`` (default) keeps the
    one-pass seeded-random-centroid index; ``n_iters>0`` runs that many
    distributed Lloyd k-means refinement passes
    (``kmeans_refine_centroids``) first, which concentrates each true data
    cluster into one list and lifts recall at the same n_probe.
    Approximate — recall grows with n_probe; n_probe == n_centroids
    degenerates to exact."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, len(q)))
    cents = (cents.T / np.linalg.norm(cents, axis=1)).T
    if n_iters > 0:
        ds = ds.materialize()  # consumed once per Lloyd pass + the probe scan
        cents = kmeans_refine_centroids(ds, cents, n_iters)
    probe = set(np.argsort(-(cents @ qn))[:n_probe].tolist())

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = (m.T / norms).T
        assign = np.argmax(mn @ cents.T, axis=1)
        mask = np.isin(assign, list(probe))
        ids = t[id_col].to_numpy(zero_copy_only=False)[mask]
        cos = (mn[mask] @ qn)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table(
            {id_col: pa.array(ids[order], type=pa.int64()), "cos": pa.array(cos[order], type=pa.float64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return partials.sort_values(["cos", id_col], ascending=[False, True], kind="mergesort").head(k).reset_index(drop=True)


def reciprocal_topk_pairs(ds, k: int = 10, id_col: str = "vec_id", chunk: int = 4096):
    """Reciprocal k-NN pairs: (a, b) such that b is in a's cosine top-k AND
    a is in b's — the mutual-nearest-neighbor filter dedup/alignment
    pipelines use to keep only high-confidence matches.

    Three bounded stages, no global broadcast:
    1. blocked distributed matmul (like ``cosine_all_pairs_exact`` but each
       (block_i, block_j) task emits, per row of BOTH blocks, a SUPERSET of
       its local top-k — every candidate with rounded-cos >= the row's k-th
       largest, so rounding ties can never cut a true neighbor;
    2. per-src global top-k: one hash partition per src set, vectorized
       (sort + head-k) — ROW_NUMBER semantics, ties break on neighbor id;
    3. mutuality: unordered-pair groupby, keep pairs seen from BOTH sides.

    cos is round-half-away to 4 (DuckDB ROUND) BEFORE selection so ranking
    is reproducible across engines. Blocks are ``chunk`` rows so one task's
    similarity matrix stays ~chunk^2*8 bytes."""
    import ray
    import ray.data as rd

    def norm_block(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = (m.T / norms).T
        d = mn.shape[1] if mn.size else 0
        offsets = pa.array(np.arange(0, (len(mn) + 1) * d, d, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(mn.ravel(), type=pa.float64()))
        return pa.table(
            {
                "id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), type=pa.int64()
                ),
                "emb": emb,
            }
        )

    normed = ds.map_batches(norm_block, batch_format="pyarrow").materialize()
    n_rows = normed.count()
    target_blocks = max(1, -(-n_rows // chunk))
    if normed.num_blocks() != target_blocks:
        normed = normed.repartition(target_blocks).materialize()
    blocks = normed.to_arrow_refs()

    def _row_candidates(cr: np.ndarray, ia: np.ndarray, ib: np.ndarray):
        """Per row of cr (rows ~ ia): all cols with cr >= row's k-th largest."""
        nb = cr.shape[1]
        if nb > k:
            thr = np.partition(cr, nb - k, axis=1)[:, nb - k]
        else:
            thr = np.full(cr.shape[0], -np.inf)
        mask = cr >= thr[:, None]
        ri, ci = np.nonzero(mask)
        return ia[ri], ib[ci], cr[ri, ci]

    @ray.remote
    def _cand_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ia = ta["id"].to_numpy(zero_copy_only=False)
        ib = tb["id"].to_numpy(zero_copy_only=False)
        c = _to_matrix(ta["emb"]) @ _to_matrix(tb["emb"]).T
        p = 10.0**4
        cr = np.where(c >= 0, np.floor(c * p + 0.5), np.ceil(c * p - 0.5)) / p
        if same:
            np.fill_diagonal(cr, -np.inf)
        srcs, dsts, coss = [], [], []
        a_src, a_dst, a_cos = _row_candidates(cr, ia, ib)
        srcs.append(a_src), dsts.append(a_dst), coss.append(a_cos)
        if not same:
            # same-block: the row scan above already emits BOTH directions
            # (cr is symmetric); a transpose scan would duplicate every
            # candidate and crowd real neighbors out of the top-k head.
            b_src, b_dst, b_cos = _row_candidates(
                np.ascontiguousarray(cr.T), ib, ia
            )
            srcs.append(b_src), dsts.append(b_dst), coss.append(b_cos)
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs), type=pa.int64()),
                "dst": pa.array(np.concatenate(dsts), type=pa.int64()),
                "cos": pa.array(np.concatenate(coss), type=pa.float64()),
            }
        )

    refs = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            refs.append(_cand_task.remote(blocks[i], blocks[j], i == j))
    cands = rd.from_arrow_refs(refs)

    def topk_per_src(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype=np.int64),
                    "dst": pd.Series([], dtype=np.int64),
                    "cos": pd.Series([], dtype=np.float64),
                }
            )
        pdf = pdf.sort_values(["src", "cos", "dst"], ascending=[True, False, True],
                              kind="mergesort")
        return pdf.groupby("src", as_index=False).head(k)

    topk = partition_map_groups(cands, ["src"], topk_per_src, num_partitions=16)

    def mutual(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype=np.int64),
                    "right_id": pd.Series([], dtype=np.int64),
                    "cos": pd.Series([], dtype=np.float64),
                }
            )
        g = pdf.groupby(["left_id", "right_id"], as_index=False).agg(
            n=("cos", "size"), cos=("cos", "max")
        )
        return g[g["n"] == 2][["left_id", "right_id", "cos"]]

    def add_pair_key(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "left_id": pa.array(np.minimum(s, d), type=pa.int64()),
                "right_id": pa.array(np.maximum(s, d), type=pa.int64()),
                "cos": t["cos"],
            }
        )

    keyed = topk.map_batches(add_pair_key, batch_format="pyarrow")
    out = partition_map_groups(keyed, ["left_id", "right_id"], mutual, num_partitions=16)
    pdf = out.to_pandas()
    return pdf.sort_values(["left_id", "right_id"], kind="mergesort").reset_index(drop=True)
