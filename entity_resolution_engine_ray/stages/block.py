"""Stage 2 — page features + MinHash-LSH blocking keys.

``FeatureExtractor`` is a stateful actor-pool ``map_batches`` class: the
MinHash coefficient tables and the token-hash cache are built once per actor
in ``__init__`` (the reference's module-level config loads, e.g.
matchers/teams_matcher.py:23-26, become actor state per SURVEY.md §7.2), then
every batch is processed with shared state. All hashing is deterministic
(multiply-shift with fixed seeds), so every actor computes identical keys.

Outputs one features Dataset:

    url:string, warc_ts:timestamp, lang:string, title_norm:string,
    tokens:string (unique sorted tokens, "\\x1f"-joined — a plain string
    because Arrow hash-joins don't support list payload columns),
    simhash:int64, band_keys:list<int64>

``explode_block_rows`` then derives the lightweight (url, block_key) shuffle
rows with a vectorized Arrow list-flatten — features are NOT duplicated per
band (the heavy columns ship exactly once, into the score-stage join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entity_resolution_engine_ray.config import PagesERConfig
from entity_resolution_engine_ray.functions.similarity import (
    hash_tokens,
    jaccard_ids,
    stable_hash64,
    lsh_band_keys,
    minhash_coefficients,
    minhash_signature,
    shingle_hashes,
    simhash64,
)
from entity_resolution_engine_ray.oracle.serial import canonical_tokens


class FeatureExtractor:
    """Actor-pool batch transform: (url, warc_ts, lang, text, title) →
    features. Token-hash cache amortizes hashing across batches."""

    def __init__(self, cfg: PagesERConfig | None = None):
        self.cfg = cfg or PagesERConfig()
        self.coeffs = minhash_coefficients(self.cfg.num_perm)
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch["text"].to_pylist()
        titles = batch["title"].to_pylist()
        n = len(texts)
        tokens_col: list[str] = []
        token_ids_col: list[np.ndarray] = []
        url_hashes = np.zeros(n, dtype=np.int64)
        simhashes = np.zeros(n, dtype=np.int64)
        band_keys_col: list[list[int]] = []
        title_norms: list[str] = []
        urls_py = batch["url"].to_pylist()
        for i in range(n):
            url_hashes[i] = stable_hash64(urls_py[i])
            toks = canonical_tokens(texts[i])
            th = hash_tokens(toks, self.cache)
            sig = minhash_signature(shingle_hashes(th, k=cfg.shingle_k), *self.coeffs)
            tokens_col.append("\x1f".join(sorted(set(toks))))
            # sorted unique 32-bit token ids (low half of the 64-bit token
            # hash) — the scorer's Jaccard operates on these. Int arrays
            # stay zero-copy Arrow through the shuffle, and 32-bit ids
            # halve the fat exchange's dominant payload (see jaccard_ids);
            # MinHash/SimHash below keep the full 64-bit hashes.
            token_ids_col.append(jaccard_ids(th))
            simhashes[i] = simhash64(th)
            band_keys_col.append(lsh_band_keys(sig, cfg.bands))
            title_norms.append(" ".join(canonical_tokens(titles[i])))
        # cache growth guard for long-lived actors
        if len(self.cache) > 2_000_000:
            self.cache.clear()
        return pa.table(
            {
                "url": batch["url"],
                "url_hash": pa.array(url_hashes, type=pa.int64()),
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "title_norm": pa.array(title_norms, type=pa.string()),
                "tokens": pa.array(tokens_col, type=pa.string()),
                "token_ids": pa.array(list(token_ids_col), type=pa.list_(pa.int32())),
                "simhash": pa.array(simhashes, type=pa.int64()),
                "band_keys": pa.array(band_keys_col, type=pa.list_(pa.int64())),
            }
        )


def default_pool_size() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster CPUs (leave head
    room for the read/write stages so the pool doesn't starve the pipeline)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, cpus - 2))


# process-global featureizer cache: plain-function map_batches tasks are
# elastically scheduled (no actor-pool ramp-up), while each worker process
# still builds coefficient tables / token caches exactly once per config.
_FEATURE_STATE: dict[tuple, FeatureExtractor] = {}


def featurize_batch(batch: pa.Table, cfg: PagesERConfig) -> pa.Table:
    key = (cfg.num_perm, cfg.bands, cfg.shingle_k)
    state = _FEATURE_STATE.get(key)
    if state is None:
        state = FeatureExtractor(cfg)
        _FEATURE_STATE[key] = state
    return state(batch)


def feature_stage(extracted_ds, cfg: PagesERConfig | None = None, concurrency=None, batch_size: int = 1024):
    cfg = cfg or PagesERConfig()
    return extracted_ds.map_batches(
        featurize_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def explode_block_rows(batch: pa.Table) -> pa.Table:
    """(url, band_keys:list) → one (url, block_key) row per band, vectorized
    via Arrow list offsets (no per-row Python)."""
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    urls = batch["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    flat = keys.flatten()
    counts = np.diff(keys.offsets.to_numpy(zero_copy_only=False))
    url_rep = urls.take(pa.array(np.repeat(np.arange(len(urls)), counts), type=pa.int64()))
    return pa.table({"url": url_rep, "block_key": flat})


def block_rows_stage(features_ds):
    return features_ds.select_columns(["url", "band_keys"]).map_batches(
        explode_block_rows, batch_format="pyarrow", zero_copy_batch=True
    )


def explode_block_rows_with_features(batch: pa.Table) -> pa.Table:
    """Fat explode: one (url_hash, block_key, token_ids, simhash,
    title_norm) row per band. Ships each page's features ``bands`` times
    through ONE sort shuffle — cheaper in total than joining features onto
    the pair list twice (the join path moves the payload once per PAIR
    side, and pairs outnumber pages ~30:1 on web near-dup workloads).
    IDS ONLY on the hot path: token payload is the int64 id list and the
    page identity is the 64-bit url hash — url STRINGS never enter the pair
    shuffle or the edge output; they rejoin from the features side table
    after clustering (stages/merge)."""
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    flat = keys.flatten()
    counts = np.diff(keys.offsets.to_numpy(zero_copy_only=False))
    idx = pa.array(np.repeat(np.arange(len(keys)), counts), type=pa.int64())
    cols = {"block_key": flat}
    for name in ("url_hash", "token_ids", "simhash", "title_norm"):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[name] = col.take(idx)
    return pa.table(cols)


def fat_block_rows_stage(features_ds):
    return features_ds.select_columns(
        ["url_hash", "band_keys", "token_ids", "simhash", "title_norm"]
    ).map_batches(explode_block_rows_with_features, batch_format="pyarrow", zero_copy_batch=True)


def block_keys_stage(features_ds):
    """Key-only band explode for the hot-bucket count pass — nothing but the
    8-byte block_key column moves."""

    def flatten(batch: pa.Table) -> pa.Table:
        keys = batch["band_keys"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({"block_key": keys.flatten()})

    return features_ds.select_columns(["band_keys"]).map_batches(
        flatten, batch_format="pyarrow", zero_copy_batch=True
    )
