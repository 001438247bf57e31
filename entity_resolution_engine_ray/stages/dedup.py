"""Deduplication operators for training-data pipelines (SURVEY.md §2.7 +
driver brief): exact, MinHash-LSH, SimHash, n-gram Jaccard — each expressed
Ray-Data-first over an id+text Dataset of any size.

Shared shape with the flagship ER pipeline (stages/block, stages/pairs):
shingle → minhash → band → bucket groupby (partition-grouped, skew-capped) →
candidate pairs → exact verification → connected components. Ids here are
int64 (doc ids), so clustering uses numeric union semantics directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_engine_ray.functions.similarity import (
    hash_tokens,
    lsh_band_keys,
    minhash_coefficients,
    minhash_signature,
    ngram_set,
    shingle_hashes,
    simhash64,
    stable_hash64,
)
from entity_resolution_engine_ray.oracle.serial import canonical_tokens
from entity_resolution_engine_ray.stages.grouping import partition_map_groups
from entity_resolution_engine_ray.stages.joins import safe_join


class _DedupFeatures:
    """Actor-pool featureizer: (id, text) → (id, tokens, band_keys).

    mode="token_shingle": word-k-shingle MinHash (web text near-dup).
    mode="char_ngram":    char-n-gram MinHash (short/noisy strings)."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, k: int, mode: str):
        self.id_col, self.text_col = id_col, text_col
        self.coeffs = minhash_coefficients(num_perm)
        self.bands, self.k, self.mode = bands, k, mode
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        tokens_col, keys_col = [], []
        for text in texts:
            if self.mode == "char_ngram":
                grams = sorted(ngram_set((text or "").lower(), self.k))
                th = hash_tokens(grams, self.cache)
                sh = shingle_hashes(th, k=1)
                tokens_col.append("\x1f".join(grams))
            else:
                toks = canonical_tokens(text or "")
                th = hash_tokens(toks, self.cache)
                sh = shingle_hashes(th, k=self.k)
                tokens_col.append("\x1f".join(sorted(set(toks))))
            sig = minhash_signature(sh, *self.coeffs)
            keys_col.append(lsh_band_keys(sig, self.bands))
        if len(self.cache) > 2_000_000:
            self.cache.clear()
        return pa.table(
            {
                "id": batch[self.id_col],
                "tokens": pa.array(tokens_col, type=pa.string()),
                "band_keys": pa.array(keys_col, type=pa.list_(pa.int64())),
            }
        )


def _explode(batch: pa.Table) -> pa.Table:
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    ids = batch["id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    flat = keys.flatten()
    counts = np.diff(keys.offsets.to_numpy(zero_copy_only=False))
    rep = ids.take(pa.array(np.repeat(np.arange(len(ids)), counts), type=pa.int64()))
    return pa.table({"id": rep, "block_key": flat})


def _pairs_partition(pdf: pd.DataFrame, cap: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["block_key", "id"], kind="mergesort")
    keys = pdf["block_key"].to_numpy()
    ids = pdf["id"].to_numpy()
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, len(pdf)]
    lefts, rights = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > cap:  # skew cap: deterministic truncation of the sorted bucket
            e = s + cap
            m = cap
        ii, jj = np.triu_indices(m, k=1)
        lefts.append(ids[s:e][ii])
        rights.append(ids[s:e][jj])
    if not lefts:
        return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64), "right_id": pd.Series([], dtype=np.int64)})
    return pd.DataFrame(
        {"left_id": np.concatenate(lefts), "right_id": np.concatenate(rights)}
    ).drop_duplicates()


def _dedup_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.drop_duplicates(["left_id", "right_id"])


def _verify_jaccard(batch: pa.Table, threshold: float) -> pa.Table:
    lt = batch["tokens_left"].to_pylist()
    rt = batch["tokens_right"].to_pylist()
    jac = np.empty(len(lt), dtype=np.float64)
    for i in range(len(lt)):
        a = set(lt[i].split("\x1f")) if lt[i] else set()
        b = set(rt[i].split("\x1f")) if rt[i] else set()
        if not a and not b:
            jac[i] = 1.0
        elif not a or not b:
            jac[i] = 0.0
        else:
            inter = len(a & b)
            jac[i] = inter / (len(a) + len(b) - inter)
    out = pa.table(
        {
            "left_id": batch["left_id"],
            "right_id": batch["right_id"],
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    )
    import pyarrow.compute as pc

    return out.filter(pc.greater_equal(out["jaccard"], threshold))


def _cluster_edges_local_int(edges_pdf: pd.DataFrame, all_ids: pd.Series) -> pd.DataFrame:
    """Union-find over int edges; singleton ids cluster with themselves."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        p = parent.setdefault(x, x)
        while p != x:
            parent[x] = p = parent.setdefault(p, p)
            x = p
            p = parent[x]
        return x

    for l, r in zip(edges_pdf["left_id"], edges_pdf["right_id"]):
        rl, rr = find(int(l)), find(int(r))
        if rl != rr:
            lo, hi = (rl, rr) if rl < rr else (rr, rl)
            parent[hi] = lo
    ids = all_ids.to_numpy()
    clusters = np.fromiter((find(int(i)) for i in ids), dtype=np.int64, count=len(ids))
    return pd.DataFrame({"doc_id": ids.astype(np.int64), "cluster_id": clusters})


def near_dup_clusters(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 63,
    bands: int = 21,
    k: int = 3,
    mode: str = "token_shingle",
    max_block_size: int = 256,
    num_partitions: int = 32,
):
    """Generic near-dup clustering: (id, text) → (doc_id, cluster_id,
    cluster_size). Candidate pairs verified with EXACT Jaccard ≥ threshold.

    The final union-find runs on the driver — candidate edges are bounded by
    the LSH bucket cap, orders of magnitude below input size; the distributed
    labelprop (stages/cluster) is the alternative for adversarial inputs."""
    from entity_resolution_engine_ray.stages.block import default_pool_size

    feats = ds.map_batches(
        _DedupFeatures,
        fn_constructor_kwargs={
            "id_col": id_col,
            "text_col": text_col,
            "num_perm": num_perm,
            "bands": bands,
            "k": k,
            "mode": mode,
        },
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=default_pool_size(),
    ).materialize()

    block_rows = feats.select_columns(["id", "band_keys"]).map_batches(
        _explode, batch_format="pyarrow"
    )
    pairs = partition_map_groups(
        block_rows, ["block_key"], lambda p: _pairs_partition(p, max_block_size), num_partitions
    )
    pairs = partition_map_groups(pairs, ["left_id", "right_id"], _dedup_pairs, num_partitions)

    feat_small = feats.select_columns(["id", "tokens"])
    j = safe_join(pairs, feat_small, on=("left_id",), right_on=("id",))
    j = j.rename_columns({"tokens": "tokens_left"})
    j = safe_join(j, feat_small, on=("right_id",), right_on=("id",))
    j = j.rename_columns({"tokens": "tokens_right"})
    edges = j.map_batches(
        _verify_jaccard, fn_kwargs={"threshold": threshold}, batch_format="pyarrow"
    )

    edges_pdf = edges.to_pandas()
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col]
    labels = _cluster_edges_local_int(edges_pdf, all_ids)
    sizes = labels.groupby("cluster_id", as_index=False).size().rename(columns={"size": "cluster_size"})
    out = labels.merge(sizes, on="cluster_id")
    out["cluster_size"] = out["cluster_size"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def minhash_near_dup_clusters(ds, id_col="doc_id", text_col="text", **kw):
    return near_dup_clusters(ds, id_col=id_col, text_col=text_col, mode="token_shingle", **kw)


def ngram_near_dup_clusters(ds, id_col="doc_id", text_col="text", n: int = 3, **kw):
    return near_dup_clusters(ds, id_col=id_col, text_col=text_col, mode="char_ngram", k=n, **kw)


def simhash_stage(ds, id_col="doc_id", text_col="text"):
    """(id, text) → (id, simhash:int64) — stateless vectorized fingerprints."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        cache: dict[str, int] = {}
        for i, t in enumerate(texts):
            out[i] = simhash64(hash_tokens(canonical_tokens(t or ""), cache))
        return pa.table({id_col: batch[id_col], "simhash": pa.array(out, type=pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


def exact_dedup(ds, id_col: str, content_col: str, num_partitions: int = 32):
    """Exact dedup: hash-partition on a 64-bit content hash, keep min id per
    group (first-per-key). Returns (id, n_dupes)."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = pa.array([stable_hash64(x or "") for x in t[content_col].to_pylist()], type=pa.int64())
        return pa.table({id_col: t[id_col], "h": h})

    def first_per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("h", as_index=False).agg(**{id_col: (id_col, "min"), "n_dupes": (id_col, "size")})
        g["n_dupes"] = g["n_dupes"].astype(np.int64)
        return g[[id_col, "n_dupes"]]

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return partition_map_groups(hashed, ["h"], first_per_key, num_partitions)
