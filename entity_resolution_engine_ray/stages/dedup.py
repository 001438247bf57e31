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
    """One hash partition of (id, block_key) rows → candidate pairs.

    Buckets over ``cap`` members are deterministically truncated (sorted by
    id) and the dropped members are COUNTED in a ``dropped`` column — never
    silent (same contract as the pages pairgen, stages/pairs.py)."""
    from entity_resolution_engine_ray.stages.score import triu_pairs

    pdf = pdf.sort_values(["block_key", "id"], kind="mergesort")
    keys = pdf["block_key"].to_numpy()
    ids = pdf["id"].to_numpy()
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, len(pdf)]
    lefts, rights = [], []
    dropped = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > cap:  # skew cap: deterministic truncation of the sorted bucket
            dropped += (m * (m - 1) - cap * (cap - 1)) // 2
            e = s + cap
            m = cap
        ii, jj = triu_pairs(m)
        lefts.append(ids[s:e][ii])
        rights.append(ids[s:e][jj])
    if not lefts:
        return pd.DataFrame(
            {
                "left_id": pd.Series([], dtype=np.int64),
                "right_id": pd.Series([], dtype=np.int64),
                "dropped": pd.Series([], dtype=np.int64),
            }
        )
    out = pd.DataFrame(
        {"left_id": np.concatenate(lefts), "right_id": np.concatenate(rights)}
    ).drop_duplicates()
    drops = np.zeros(len(out), dtype=np.int64)
    drops[0] = dropped
    return out.assign(dropped=drops)


def _dedup_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.drop_duplicates(["left_id", "right_id"])


def _explode_fat(batch: pa.Table) -> pa.Table:
    """(id, tokens, band_keys) → one (id, tokens, block_key) row per band —
    ships tokens through ONE hash exchange instead of two join barriers
    (the pages pipeline's fat-block pattern, stages/block.py)."""
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    flat = keys.flatten()
    counts = np.diff(keys.offsets.to_numpy(zero_copy_only=False))
    idx = pa.array(np.repeat(np.arange(len(keys)), counts), type=pa.int64())
    return pa.table(
        {
            "id": batch["id"].combine_chunks().take(idx) if isinstance(batch["id"], pa.ChunkedArray) else batch["id"].take(idx),
            "tokens": batch["tokens"].combine_chunks().take(idx) if isinstance(batch["tokens"], pa.ChunkedArray) else batch["tokens"].take(idx),
            "block_key": flat,
        }
    )


def _pair_verify_partition(pdf: pd.DataFrame, cap: int, threshold: float) -> pd.DataFrame:
    """One hash partition of fat (id, tokens, block_key[, salt]) rows →
    VERIFIED edges (exact Jaccard ≥ threshold). Hot buckets arrive pre-split
    by salt; the cap + ``dropped`` counter remain as the backstop for salt
    hash variance."""
    if "salt" not in pdf.columns:
        pdf = pdf.assign(salt=np.zeros(len(pdf), dtype=np.int32))
    pdf = pdf.sort_values(["block_key", "salt", "id"], kind="mergesort")
    keys = pdf["block_key"].to_numpy()
    salts = pdf["salt"].to_numpy()
    ids = pdf["id"].to_numpy()
    toks = pdf["tokens"].to_numpy()
    change = np.flatnonzero((keys[1:] != keys[:-1]) | (salts[1:] != salts[:-1])) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, len(pdf)]
    lefts, rights = [], []
    dropped = 0
    from entity_resolution_engine_ray.stages.score import triu_pairs

    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m > cap:
            dropped += (m * (m - 1) - cap * (cap - 1)) // 2
            e = s + cap
            m = cap
        ii, jj = triu_pairs(m)
        lefts.append(ii + s)
        rights.append(jj + s)
    cols = ["left_id", "right_id", "jaccard", "dropped"]
    if not lefts:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype=np.float64 if c == "jaccard" else np.int64)
                for c in cols
            }
        )
    lidx = np.concatenate(lefts)
    ridx = np.concatenate(rights)
    # partition-local pair dedup before the (expensive) exact verify
    pre = pd.DataFrame({"l": ids[lidx], "r": ids[ridx], "li": lidx, "ri": ridx})
    pre = pre.drop_duplicates(["l", "r"])
    lidx, ridx = pre["li"].to_numpy(), pre["ri"].to_numpy()
    set_cache: dict[str, frozenset] = {}

    def tokset(joined: str) -> frozenset:
        v = set_cache.get(joined)
        if v is None:
            v = frozenset(joined.split("\x1f")) if joined else frozenset()
            set_cache[joined] = v
        return v

    n = len(lidx)
    jac = np.empty(n, dtype=np.float64)
    for i in range(n):
        sa = tokset(toks[lidx[i]])
        sb = tokset(toks[ridx[i]])
        if not sa and not sb:
            jac[i] = 1.0
        elif not sa or not sb:
            jac[i] = 0.0
        else:
            inter = len(sa & sb)
            jac[i] = inter / (len(sa) + len(sb) - inter)
    keep = jac >= threshold
    out = pd.DataFrame(
        {
            "left_id": ids[lidx[keep]].astype(np.int64),
            "right_id": ids[ridx[keep]].astype(np.int64),
            "jaccard": jac[keep],
        }
    )
    drops = np.zeros(len(out), dtype=np.int64)
    if len(out):
        drops[0] = dropped
    elif dropped:
        # no surviving pair may still have drops to report — emit a marker row
        out = pd.DataFrame({"left_id": [-1], "right_id": [-1], "jaccard": [-1.0]})
        drops = np.array([dropped], dtype=np.int64)
    return out.assign(dropped=drops)


def near_dup_edges(
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
    """(id, text) → (verified edge Dataset (left_id, right_id, jaccard),
    dropped_pair_count). Fully distributed: feature → fat band explode →
    ONE hash exchange with in-partition pair-gen + exact-Jaccard verify →
    one slim dedup exchange."""
    import ray.data as rd

    from entity_resolution_engine_ray.stages.block import default_pool_size

    # zero-row inputs skip lazy transforms, leaving blocks with the SOURCE
    # schema — the exchange would then see no block_key column; short-circuit
    # (source count is metadata-cheap for parquet/arrow inputs)
    if ds.count() == 0:
        empty = pa.table(
            {
                "left_id": pa.array([], type=pa.int64()),
                "right_id": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
        return rd.from_arrow(empty), 0

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

    # hot-bucket salting (same scheme as the pages pipeline): buckets over
    # the cap are split into deterministic id-hash sub-buckets instead of
    # being truncated — identical docs beyond the cap still pair (within
    # their salt; cross-salt recall is carried by the other bands). The
    # count pass runs over SLIM (id, block_key) rows — no token payload.
    from entity_resolution_engine_ray.stages.pairs import hot_key_splits

    slim = feats.select_columns(["id", "band_keys"]).map_batches(
        _explode, batch_format="pyarrow"
    )
    hot = hot_key_splits(slim, max_block_size)

    def salt_fat(t: pa.Table) -> pa.Table:
        from entity_resolution_engine_ray.oracle.serial import salt_of

        keys = t["block_key"].to_numpy(zero_copy_only=False)
        salts = np.zeros(len(keys), dtype=np.int32)
        if hot:
            ids = t["id"].to_numpy(zero_copy_only=False)
            for i, kk in enumerate(keys):
                ns = hot.get(int(kk))
                if ns:
                    salts[i] = salt_of(int(ids[i]), int(kk), ns)
        return t.append_column("salt", pa.array(salts, type=pa.int32()))

    fat = feats.map_batches(_explode_fat, batch_format="pyarrow").map_batches(
        salt_fat, batch_format="pyarrow"
    )
    raw = partition_map_groups(
        fat,
        ["block_key", "salt"],
        lambda p: _pair_verify_partition(p, max_block_size, threshold),
        num_partitions,
    ).materialize()
    dropped = int(raw.sum("dropped") or 0)
    edges = raw.filter(expr="left_id >= 0 or right_id >= 0")  # drop marker rows
    edges = partition_map_groups(
        edges.drop_columns(["dropped"]),
        ["left_id", "right_id"],
        _dedup_pairs,
        num_partitions,
    )
    return edges, dropped


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
    """Generic near-dup clustering: (id, text) → Dataset (doc_id, cluster_id,
    cluster_size). Candidate pairs verified with EXACT Jaccard ≥ threshold.

    Scale-safe finish: verified edges are clustered with the distributed
    contraction (stages/cluster.cluster_label_map — per-partition union-find
    keeps only spanning forests; the driver folds forests over CONNECTED
    nodes only, bounded by 2×edges ≪ corpus size). Labels attach to every
    doc in one broadcast ``map_batches`` pass (singletons label themselves);
    cluster sizes come from one slim int-pair exchange. Nothing driver-side
    ever materializes the full id set."""
    import ray
    import ray.data as rd

    from entity_resolution_engine_ray.stages.cluster import cluster_label_map

    if ds.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                    "cluster_size": pa.array([], type=pa.int64()),
                }
            )
        )

    edges, dropped = near_dup_edges(
        ds,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        num_perm=num_perm,
        bands=bands,
        k=k,
        mode=mode,
        max_block_size=max_block_size,
        num_partitions=num_partitions,
    )
    label_map_ref = ray.put(cluster_label_map(edges, num_partitions=num_partitions))

    def attach(t: pa.Table) -> pa.Table:
        label_map = ray.get(label_map_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        labels = np.fromiter(
            (label_map.get(int(i), int(i)) for i in ids), dtype=np.int64, count=len(ids)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "cluster_id": pa.array(labels, type=pa.int64()),
            }
        )

    labeled = ds.select_columns([id_col]).map_batches(attach, batch_format="pyarrow")

    def sizes_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("cluster_id", sort=False)["doc_id"]
        out = pdf.copy()
        out["cluster_size"] = g.transform("size").astype(np.int64)
        return out

    return partition_map_groups(labeled, ["cluster_id"], sizes_partition, num_partitions)


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
