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
    hash_tokens_flat,
    lsh_band_keys_matrix,
    minhash_coefficients,
    minhash_signatures_flat,
    shingle_hashes_flat,
    simhash64_flat,
    stable_hash64,
)
from entity_resolution_engine_ray.oracle.serial import canonical_tokens


def _comb(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _split_canonical_ascii(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized ``canonical_tokens`` for an all-ASCII string array:
    ascii_lower → RE2 ``[^\\w\\s]``→space → split_whitespace → drop empty
    tokens. On ASCII input RE2's ``\\w``/``\\s`` and Arrow's whitespace
    split agree byte-for-byte with Python's ``re``/``str.split`` (pinned by
    test_feature_extractor_matches_scalar_reference and the ascii-parity
    case in test_block_features). Returns (flat non-empty token values,
    per-doc token counts)."""
    import pyarrow.compute as pc

    rep = pc.replace_substring_regex(
        pc.ascii_lower(arr), pattern=r"[^\w\s]", replacement=" "
    )
    sp = _comb(pc.utf8_split_whitespace(rep))
    lengths = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = sp.flatten()
    nonempty = pc.not_equal(flat, "")
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(np.arange(len(sp), dtype=np.int64), lengths)
    counts = np.bincount(doc_ids[ne_np], minlength=len(sp)).astype(np.int64)
    return flat.filter(nonempty), counts


class FeatureExtractor:
    """Actor-pool batch transform: (url, warc_ts, lang, text, title) →
    features. Token-hash cache amortizes hashing across batches."""

    def __init__(self, cfg: PagesERConfig | None = None):
        self.cfg = cfg or PagesERConfig()
        self.coeffs = minhash_coefficients(self.cfg.num_perm)
        self.cache: dict[str, int] = {}

    def _hash_uniques(self, uniq: list[str]) -> np.ndarray:
        uh = np.empty(len(uniq), dtype=np.int64)
        cache = self.cache
        for i, t in enumerate(uniq):
            h = cache.get(t)
            if h is None:
                h = stable_hash64(t)
                cache[t] = h
            uh[i] = h
        return uh

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Flat whole-batch form: tokenize per doc (C regex), then ONE
        factorize-hash over the concatenated token stream and segment-
        reduced MinHash/SimHash/band-key kernels (similarity.*_flat) —
        per-DOC values identical to the scalar kernels (pinned by
        tests/test_block_features.py::test_flat_kernels_match_scalar), with
        no per-doc numpy call overhead. Measured 1.9× over the per-doc loop
        at 4096-doc batches."""
        import pyarrow.compute as pc

        cfg = self.cfg
        n = batch.num_rows
        urls_py = batch["url"].to_pylist()
        url_hashes = np.fromiter(
            (stable_hash64(u) for u in urls_py), dtype=np.int64, count=n
        )
        texts_arr = pc.fill_null(_comb(batch["text"]), "")
        titles_arr = pc.fill_null(_comb(batch["title"]), "")
        ascii_ok = bool(
            n
            and pc.all(pc.string_is_ascii(texts_arr)).as_py()
            and pc.all(pc.string_is_ascii(titles_arr)).as_py()
        )
        if ascii_ok:
            # Arrow fast path: the flat token stream never materializes as
            # Python objects; only the batch's UNIQUE tokens do (for the
            # cached blake2b hash) — byte-identical to the fallback below
            flat_vals, counts = _split_canonical_ascii(texts_arr)
            offsets = np.r_[0, counts.cumsum()]
            denc = _comb(flat_vals).dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = denc.dictionary.to_pylist()
            uh = self._hash_uniques(uniq)
            flat_h = uh.astype(np.uint64)[codes] if len(codes) else np.empty(0, dtype=np.uint64)
            # per-doc "\x1f".join(sorted(set(tokens))): rank unique tokens
            # once in Python-string order, dedupe (doc, rank) pairs, then
            # ONE C++ binary_join over the rank-ordered string lists
            order = np.argsort(np.asarray(uniq, dtype=object)) if uniq else np.empty(0, np.int64)
            rank = np.empty(len(uniq), dtype=np.int64)
            rank[order] = np.arange(len(uniq))
            flat_ranks = rank[codes] if len(codes) else np.empty(0, np.int64)
            doc_ids_ne = np.repeat(np.arange(n, dtype=np.int64), counts)
            permr = np.lexsort((flat_ranks, doc_ids_ne))
            dsr, rsr = doc_ids_ne[permr], flat_ranks[permr]
            keepr = (
                np.r_[True, (dsr[1:] != dsr[:-1]) | (rsr[1:] != rsr[:-1])]
                if len(dsr)
                else np.zeros(0, dtype=bool)
            )
            uniq_sorted = pa.array(np.asarray(uniq, dtype=object)[order], type=pa.string())
            ucounts = np.bincount(dsr[keepr], minlength=n) if len(dsr) else np.zeros(n, np.int64)
            tok_lists = pa.ListArray.from_arrays(
                pa.array(np.r_[0, ucounts.cumsum()].astype(np.int32)),
                uniq_sorted.take(pa.array(rsr[keepr], type=pa.int64()))
                if len(dsr)
                else pa.array([], type=pa.string()),
            )
            tokens_arr = pc.binary_join(tok_lists, "\x1f")
            tflat, tcounts = _split_canonical_ascii(titles_arr)
            title_arr = pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(np.r_[0, tcounts.cumsum()].astype(np.int32)), tflat
                ),
                " ",
            )
        else:
            texts = texts_arr.to_pylist()
            titles = titles_arr.to_pylist()
            toks_per_doc = [canonical_tokens(t) for t in texts]
            counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n)
            offsets = np.r_[0, counts.cumsum()]
            flat_tokens = np.empty(int(offsets[-1]), dtype=object)
            pos = 0
            for toks in toks_per_doc:
                flat_tokens[pos : pos + len(toks)] = toks
                pos += len(toks)
            flat_h = hash_tokens_flat(flat_tokens, self.cache)
            tokens_arr = pa.array(
                ["\x1f".join(sorted(set(toks))) for toks in toks_per_doc], type=pa.string()
            )
            title_arr = pa.array(
                [" ".join(canonical_tokens(t)) for t in titles], type=pa.string()
            )
        # sorted unique 32-bit token ids per doc (low half of the 64-bit
        # token hash) — the scorer's Jaccard operates on these. Int arrays
        # stay zero-copy Arrow through the shuffle, and 32-bit ids halve
        # the fat exchange's dominant payload (see jaccard_ids);
        # MinHash/SimHash keep the full 64-bit hashes.
        ids32 = (flat_h & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        doc_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
        perm = np.lexsort((ids32, doc_ids))
        ds_, is_ = doc_ids[perm], ids32[perm]
        keep = np.r_[True, (ds_[1:] != ds_[:-1]) | (is_[1:] != is_[:-1])] if len(ds_) else np.zeros(0, dtype=bool)
        uniq_counts = np.bincount(ds_[keep], minlength=n) if len(ds_) else np.zeros(n, dtype=np.int64)
        token_ids_arr = pa.ListArray.from_arrays(
            pa.array(np.r_[0, uniq_counts.cumsum()].astype(np.int32)),
            pa.array(is_[keep] if len(ds_) else np.zeros(0, dtype=np.int32), type=pa.int32()),
        )
        flat_sh, sh_counts = shingle_hashes_flat(flat_h, offsets, k=cfg.shingle_k)
        sigs = minhash_signatures_flat(flat_sh, sh_counts, *self.coeffs)
        band_mat = lsh_band_keys_matrix(sigs, cfg.bands)
        band_keys_arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * cfg.bands, cfg.bands, dtype=np.int32)),
            pa.array(band_mat.reshape(-1), type=pa.int64()),
        )
        simhashes = simhash64_flat(flat_h, offsets)
        # cache growth guard for long-lived actors
        if len(self.cache) > 2_000_000:
            self.cache.clear()
        return pa.table(
            {
                "url": batch["url"],
                "url_hash": pa.array(url_hashes, type=pa.int64()),
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "title_norm": title_arr,
                "tokens": tokens_arr,
                "token_ids": token_ids_arr,
                "simhash": pa.array(simhashes, type=pa.int64()),
                "band_keys": band_keys_arr,
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
