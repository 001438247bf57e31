"""Stage 4 — pairwise scoring + three-way gate.

    score = w_j * token_jaccard  +  w_s * simhash_similarity  +  w_t * jaro_winkler(title)

Primary path: ``fused_edges_stage`` — ONE fat-block hash exchange carrying
(url_hash, token_ids, simhash, title_norm) per band row (IDS ONLY: url
strings never enter the pair shuffle, the scored output, or the edge-dedup
exchange — they rejoin from the features side table after clustering);
each partition generates pairs (salted, capped, drop-counted), pre-dedups,
and scores fully vectorized: SimHash via uint64 XOR + popcount, Jaccard
via the grouped int64 ``searchsorted`` kernel (``_grouped_jaccard_flat``),
Jaro-Winkler via the length-bucketed batch kernel over unique title pairs.
Legacy SLOW path: ``score_stage`` (pair list ⋈ features ×2 hash joins →
``PairScorer`` actor pool) kept only for composability with external
url-keyed pair lists — its Jaccard is a per-pair Python set loop; do not
put it on a hot path.

The gate reproduces the reference router's three-way semantics
(validation/router.py:165-170): ``score < low → reject``;
``score >= high → auto_approve``; gray zone resolves via the configured
fallback (``auto_approve`` default / ``review``) exactly like the reference's
LLM-disabled path (router.py:81-94). An optional LLM validator would slot in
as a second actor-pool stage over ``decision == "review"`` rows only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from entity_resolution_engine_ray.config import PagesERConfig
from entity_resolution_engine_ray.functions.similarity import jaro_winkler_batch


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


# np.triu_indices has ~40µs fixed overhead per call — with thousands of tiny
# LSH blocks per partition that's pure overhead; cache per block size
# (bounded: sizes ≤ max salted sub-block, a few hundred entries)
_TRIU_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def triu_pairs(m: int) -> tuple[np.ndarray, np.ndarray]:
    out = _TRIU_CACHE.get(m)
    if out is None:
        out = np.triu_indices(m, k=1)
        if len(_TRIU_CACHE) < 4096:
            _TRIU_CACHE[m] = out
    return out


def _jw_from_codes(
    cl: np.ndarray, cr: np.ndarray, dict_l: np.ndarray, dict_r: np.ndarray
) -> np.ndarray:
    """Jaro-Winkler per pair, computed once per UNIQUE (left, right) code
    pair — the ONE decode kernel shared by the fused path (dictionary-
    encoded titles) and the legacy PairScorer (factorized titles), so the
    zero-length-dictionary guard can never drift between them."""
    nd = np.int64(max(len(dict_r), 1))
    code = cl.astype(np.int64) * nd + cr
    uniq, inv = np.unique(code, return_inverse=True)
    return jaro_winkler_batch(dict_l[uniq // nd], dict_r[uniq % nd])[inv]


def _jw_unique_pairs(titles_l: np.ndarray, titles_r: np.ndarray) -> np.ndarray:
    """Jaro-Winkler per pair over raw title arrays (factorize + shared
    unique-pair decode)."""
    import pandas as pd

    ca, ua = pd.factorize(titles_l)
    cb, ub = pd.factorize(titles_r)
    return _jw_from_codes(ca, cb, np.asarray(ua), np.asarray(ub))


class PairScorer:
    """Actor-pool batch scorer. Construction cost (config parse) runs once
    per actor; per-batch work is vectorized where the kernel allows."""

    def __init__(self, cfg: PagesERConfig | None = None):
        self.cfg = cfg or PagesERConfig()
        # actor-lifetime cache: near-dup workloads repeat the same urls
        # across many pairs, so token-set construction hits this cache far
        # more than it misses. Bounded — cleared when oversized.
        self._set_cache: dict[str, frozenset] = {}

    def _tokset(self, joined: str) -> frozenset:
        s = self._set_cache.get(joined)
        if s is None:
            s = frozenset(joined.split("\x1f")) if joined else frozenset()
            self._set_cache[joined] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        lt = batch["tokens_left"].to_pylist()
        rt = batch["tokens_right"].to_pylist()
        ltit = batch["title_left"].to_pylist()
        rtit = batch["title_right"].to_pylist()
        sl = batch["simhash_left"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sr = batch["simhash_right"].to_numpy(zero_copy_only=False).astype(np.uint64)

        sim_sim = 1.0 - _popcount64(np.bitwise_xor(sl, sr)) / 64.0

        jac = np.empty(n, dtype=np.float64)
        for i in range(n):
            # tokens are "\x1f"-joined unique sorted token strings
            sa = self._tokset(lt[i])
            sb = self._tokset(rt[i])
            if not sa and not sb:
                jac[i] = 1.0
            elif not sa or not sb:
                jac[i] = 0.0
            else:
                inter = len(sa & sb)
                jac[i] = inter / (len(sa) + len(sb) - inter)
        jw = _jw_unique_pairs(np.asarray(ltit, dtype=object), np.asarray(rtit, dtype=object))
        if len(self._set_cache) > 500_000:
            self._set_cache.clear()

        score = cfg.weight_jaccard * jac + cfg.weight_simhash * sim_sim + cfg.weight_title * jw

        gray_label = "gray_approve" if cfg.fallback_mode == "auto_approve" else "review"
        decision = np.where(
            score < cfg.gate_low,
            "reject",
            np.where(score >= cfg.gate_high, "auto_approve", gray_label),
        )
        return pa.table(
            {
                "left_url": batch["left_url"],
                "right_url": batch["right_url"],
                "block_key": batch["block_key"],
                "score": pa.array(score, type=pa.float64()),
                "jaccard": pa.array(jac, type=pa.float64()),
                "simhash_sim": pa.array(sim_sim, type=pa.float64()),
                "title_sim": pa.array(jw, type=pa.float64()),
                "decision": pa.array(decision.tolist(), type=pa.string()),
            }
        )


def score_stage(pairs_ds, features_ds, cfg: PagesERConfig | None = None, num_partitions: int | None = None):
    """pairs (left_url, right_url, block_key) ⋈ features ×2 → scored edges."""
    from entity_resolution_engine_ray.stages.joins import safe_join

    cfg = cfg or PagesERConfig()
    feat = features_ds.select_columns(["url", "tokens", "simhash", "title_norm"])
    joined = safe_join(
        pairs_ds, feat, on=("left_url",), right_on=("url",), num_partitions=num_partitions
    )
    # first join emits unsuffixed feature columns; rename before the second
    joined = joined.rename_columns(
        {"tokens": "tokens_left", "simhash": "simhash_left", "title_norm": "title_left"}
    )
    joined = safe_join(
        joined, feat, on=("right_url",), right_on=("url",), num_partitions=num_partitions
    )
    joined = joined.rename_columns(
        {"tokens": "tokens_right", "simhash": "simhash_right", "title_norm": "title_right"}
    )
    from entity_resolution_engine_ray.stages.block import default_pool_size

    return joined.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
        concurrency=cfg.score_concurrency or default_pool_size(),
    )


_EDGE_SCHEMA = pa.schema(
    [
        ("left_id", pa.int64()),
        ("right_id", pa.int64()),
        ("block_key", pa.int64()),
        ("score", pa.float64()),
        ("jaccard", pa.float64()),
        ("simhash_sim", pa.float64()),
        ("title_sim", pa.float64()),
        ("decision", pa.string()),
        ("dropped", pa.int64()),
    ]
)


def _grouped_jaccard_flat(
    tvals: np.ndarray, tstarts: np.ndarray, tlens: np.ndarray, lidx: np.ndarray, ridx: np.ndarray
) -> np.ndarray:
    """Grouped exact Jaccard over a FLAT token-id layout: doc i's sorted
    unique ids are ``tvals[tstarts[i] : tstarts[i]+tlens[i]]``. Consuming
    the Arrow ListArray's (values, offsets) buffers directly skips the
    to_pandas conversion that would allocate one numpy object per row.

    Shape note (measured on the flagship fixture): a fully-vectorized
    variant — rank tokens, build one global sorted ``(row<<32)|rank`` key
    array, one searchsorted for ALL pairs — is 5× SLOWER here: with
    hundreds of tokens per doc the global binary search touches a ~128 MB
    key array per probe (cache-hostile) and the gathered right-side
    buffers run to GBs. The per-left-doc loop keeps every search inside a
    doc-sized, cache-resident window; its cost is ~50 µs/group of numpy
    call overhead, minimized below (bound-method calls, no ``np.r_`` in
    the loop)."""
    n = len(lidx)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    order = np.argsort(lidx, kind="stable")
    lo, ro = lidx[order], ridx[order]
    bounds = np.r_[0, np.flatnonzero(lo[1:] != lo[:-1]) + 1, n]
    inter = np.zeros(n, dtype=np.int64)
    for gi in range(len(bounds) - 1):
        s, e = bounds[gi], bounds[gi + 1]
        left = lo[s]
        la = tlens[left]
        if la == 0:
            continue
        A = tvals[tstarts[left] : tstarts[left] + la]
        rr = ro[s:e]
        blens = tlens[rr]
        nz = np.flatnonzero(blens)
        if len(nz) == 0:
            continue
        cat = np.concatenate(
            [tvals[tstarts[j] : tstarts[j] + tlens[j]] for j in rr[nz]]
        )
        pos = A.searchsorted(cat)
        pos[pos >= la] = la - 1
        hit = (A[pos] == cat).astype(np.int64)
        # reduceat is undefined for zero-length segments — filtered above
        cs = blens[nz].cumsum()
        inter[s + nz] = np.add.reduceat(hit, cs - blens[nz])
    la_, lb_ = tlens[lo], tlens[ro]
    union = la_ + lb_ - inter
    jac_o = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    jac = np.empty(n, dtype=np.float64)
    jac[order] = jac_o
    return jac


def _combined(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _keep_block_keys(t: pa.Table, allowed_ref) -> pa.Table:
    """Keep rows whose block_key is in the broadcast sorted int64 array
    (``ray.put`` once, zero-copy plasma read per task, vectorized
    searchsorted per batch). Used by both the incremental ``key_filter``
    path and the singleton-bucket prune."""
    import ray

    if t.num_rows == 0:
        return t
    allowed = ray.get(allowed_ref)
    k = t["block_key"].to_numpy(zero_copy_only=False)
    if len(allowed) == 0:
        return t.filter(pa.array(np.zeros(len(k), dtype=bool)))
    pos = np.searchsorted(allowed, k)
    pos[pos >= len(allowed)] = len(allowed) - 1
    return t.filter(pa.array(allowed[pos] == k))


def _pair_score_partition(tbl: pa.Table, cfg: PagesERConfig) -> pa.Table:
    """One hash partition of fat (block_key, salt) sub-blocks → scored,
    gated edges, IDS ONLY (left_id/right_id int64 url hashes — no url
    strings ride the pair shuffle or the edge output; urls rejoin from the
    features side table after clustering). Sub-block members order by
    url_hash — the serial oracle orders identically, so pair identity, cap
    truncation and left/right orientation stay in exact parity.

    Arrow-native: the partition table is consumed column-by-column
    (``np.lexsort`` over int64 keys, token ids via the ListArray's flat
    (values, offsets) buffers, titles dictionary-encoded in C++ so only
    UNIQUE title strings ever materialize as Python objects). The previous
    pandas form paid one numpy-object allocation per row for the token
    list column plus a full-frame mergesort that copied every list —
    conversion cost rivaled kernel cost on the hottest stage."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return _EDGE_SCHEMA.empty_table()
    keys = tbl["block_key"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    salts = tbl["salt"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    url_hashes = tbl["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    order = np.lexsort((url_hashes, salts, keys))  # primary key: block_key
    keys, salts, url_hashes = keys[order], salts[order], url_hashes[order]

    tok = _combined(tbl["token_ids"])
    toffs = tok.offsets.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    # keep the values buffer in its native dtype (int32 since the 32-bit
    # Jaccard ids — an astype(int64) here would copy the fattest buffer)
    tvals = tok.values.to_numpy(zero_copy_only=False)
    tstarts = toffs[:-1][order]
    tlens = (toffs[1:] - toffs[:-1])[order]

    sims = tbl["simhash"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)[order]
    tenc = pc.dictionary_encode(_combined(tbl["title_norm"]))
    tcodes = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)[order]
    tdict = np.asarray(tenc.dictionary.to_pylist(), dtype=object)

    change = np.flatnonzero((keys[1:] != keys[:-1]) | (salts[1:] != salts[:-1])) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, tbl.num_rows]
    li, ri, okeys = [], [], []
    dropped = 0
    cap = cfg.pair_sample_cap
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        ii, jj = triu_pairs(m)
        if len(ii) > cap:
            dropped += len(ii) - cap
            ii, jj = ii[:cap], jj[:cap]
        li.append(ii + s)
        ri.append(jj + s)
        okeys.append(np.full(len(ii), keys[s], dtype=np.int64))
    if not li:
        return _EDGE_SCHEMA.empty_table()
    lidx = np.concatenate(li)
    ridx = np.concatenate(ri)
    okey = np.concatenate(okeys)
    if lidx.size == 0:  # cap=0 edge: appended slices can all be empty
        return _EDGE_SCHEMA.empty_table()
    # partition-local pre-dedup (same pair emitted by several bands that
    # hashed into this partition): keep min block_key, skip re-scoring.
    # The global cross-partition dedup still runs downstream.
    pl, pr = url_hashes[lidx], url_hashes[ridx]
    perm = np.lexsort((okey, pr, pl))
    pls, prs = pl[perm], pr[perm]
    first = np.r_[True, (pls[1:] != pls[:-1]) | (prs[1:] != prs[:-1])]
    sel = perm[first]
    lidx, ridx, okey = lidx[sel], ridx[sel], okey[sel]
    n = len(lidx)
    sim_sim = 1.0 - _popcount64(
        np.bitwise_xor(sims[lidx].astype(np.uint64), sims[ridx].astype(np.uint64))
    ) / 64.0
    if cfg.simhash_prefilter is not None:
        # Hamming prefilter BEFORE the exact-Jaccard / title kernels (the
        # two dominant per-pair costs) — same rule as the serial oracle
        # (oracle/serial.py run_serial_er), counted into dropped_pairs.
        # Count semantics: APPROXIMATE — a pair colliding in several bands
        # is prefiltered (and counted) once per partition instance, where
        # the oracle counts the unique pair once; and a partition whose
        # pairs are ALL prefiltered emits zero rows so its count can't
        # ride the dropped column. nonzero ⇔ pruning happened is the
        # contract; the EDGE SET stays exactly oracle-equal either way
        # (pinned by test_simhash_prefilter_parity_and_pruning).
        keepm = sim_sim >= cfg.simhash_prefilter
        dropped += int(n - keepm.sum())
        if not keepm.all():
            lidx, ridx, okey, sim_sim = lidx[keepm], ridx[keepm], okey[keepm], sim_sim[keepm]
            n = len(lidx)
            if n == 0:
                return _EDGE_SCHEMA.empty_table()
    jac = _grouped_jaccard_flat(tvals, tstarts, tlens, lidx, ridx)
    jw = _jw_from_codes(tcodes[lidx], tcodes[ridx], tdict, tdict)

    score = cfg.weight_jaccard * jac + cfg.weight_simhash * sim_sim + cfg.weight_title * jw
    gray_label = "gray_approve" if cfg.fallback_mode == "auto_approve" else "review"
    dec_code = np.where(
        score < cfg.gate_low, 0, np.where(score >= cfg.gate_high, 2, 1)
    ).astype(np.int8)
    decision = pc.take(
        pa.array(["reject", gray_label, "auto_approve"], type=pa.string()),
        pa.array(dec_code),
    )
    drops = np.zeros(n, dtype=np.int64)
    drops[0] = dropped
    return pa.table(
        {
            "left_id": pa.array(url_hashes[lidx], type=pa.int64()),
            "right_id": pa.array(url_hashes[ridx], type=pa.int64()),
            "block_key": pa.array(okey, type=pa.int64()),
            "score": pa.array(score, type=pa.float64()),
            "jaccard": pa.array(jac, type=pa.float64()),
            "simhash_sim": pa.array(sim_sim, type=pa.float64()),
            "title_sim": pa.array(jw, type=pa.float64()),
            "decision": decision,
            "dropped": pa.array(drops, type=pa.int64()),
        }
    )


def _dedup_edges_partition(tbl: pa.Table) -> pa.Table:
    """Keep the min-block_key instance of each scored pair (scores of
    duplicate instances are identical by construction). Keyed on the int64
    url-hash ids — 16-byte keys hash/sort far cheaper than url strings at
    web scale (pair sets reach ~80 rows/page on dense fixtures). Arrow
    take keyed by a numpy lexsort — the string decision column never
    converts to Python objects."""
    if tbl.num_rows == 0:
        return tbl
    l = tbl["left_id"].to_numpy(zero_copy_only=False)
    r = tbl["right_id"].to_numpy(zero_copy_only=False)
    k = tbl["block_key"].to_numpy(zero_copy_only=False)
    perm = np.lexsort((k, r, l))
    ls, rs = l[perm], r[perm]
    first = np.r_[True, (ls[1:] != ls[:-1]) | (rs[1:] != rs[:-1])]
    return tbl.take(pa.array(perm[first]))


def fused_edges_stage(
    features_ds,
    cfg: PagesERConfig | None = None,
    num_partitions: int | None = None,
    key_filter=None,
):
    """features → scored+gated edge Dataset in two shuffles (fat-block
    sort shuffle + slim edge dedup), replacing the pairgen + 2-join + score
    chain. Returns (edges_ds, dropped_pair_count).

    The two shuffles are CHAINED (exchange.hash_exchange_chained): the edge
    dedup split for partition p is scheduled directly on the score reduce
    ref for p, so dedup starts the moment each score partition finishes —
    no driver barrier between the waves, and the per-partition dropped
    counts fold in via side tasks instead of a driver-side full-column scan.

    ``key_filter``: optional sorted int64 array of block keys — only blocks
    with those keys are paired/scored (the incremental-resolution path:
    blocks untouched by a new batch keep their previously-scored edges).
    Broadcast once via ``ray.put``; filtering is a vectorized searchsorted
    per batch on both the key-only and fat paths, so untouched blocks never
    enter the shuffle at all.

    ``num_partitions=None`` scales with BOTH the cluster and the data:
    max(1.5 × cluster CPUs, PRUNED fat rows / 200k), capped at 65,536 — a
    fixed count would under-split a 256-node cluster and over-split a
    laptop. The 200k-pruned-rows target replaces the old 50k-unpruned
    target after a 1M-page sweep (BASELINE r5): each partition costs
    ~0.1 s of fixed task/ref overhead in the chained exchange, so P=421
    ran the stage in 107 s where P=96 ran it in 50 s with identical
    edges; at sf0.1 the formula still lands on the 1.5×CPU floor (48,
    the measured best there). Partition payload at the target is ~60 MB
    of fat rows + in-flight pair arrays — well inside a worker heap; at
    the 65,536 cap (~13G pruned rows ≈ 6×10⁸ pages) shard the corpus via
    the incremental ``key_filter`` path instead."""
    from entity_resolution_engine_ray.stages.block import block_keys_stage, fat_block_rows_stage
    from entity_resolution_engine_ray.stages.exchange import hash_exchange_chained
    from entity_resolution_engine_ray.stages.pairs import _salt_batch, key_stats

    cfg = cfg or PagesERConfig()
    features_ds = features_ds.materialize()
    import ray

    keys_ds = block_keys_stage(features_ds)  # key-only explode: 8 bytes/row
    fat = fat_block_rows_stage(features_ds)
    if key_filter is not None:
        allowed_ref = ray.put(np.asarray(key_filter, dtype=np.int64))
        keys_ds = keys_ds.map_batches(
            _keep_block_keys, fn_kwargs={"allowed_ref": allowed_ref}, batch_format="pyarrow"
        )
        fat = fat.map_batches(
            _keep_block_keys, fn_kwargs={"allowed_ref": allowed_ref}, batch_format="pyarrow"
        )
    hot, pairable, n_pruned = key_stats(
        keys_ds,
        cfg.max_block_size,
        n_rows_hint=features_ds.count() * cfg.bands,  # metadata-only count
    )
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # when the pairable set exceeded its broadcast limit the prune is
        # skipped, so the exchange really carries n_fat rows — size for it
        n_exchange = n_pruned if pairable is not None else features_ds.count() * cfg.bands
        num_partitions = int(np.clip(n_exchange // 200_000 + 1, int(1.5 * cpus), 65_536))
    if pairable is not None:
        if len(pairable) == 0:
            # no bucket has ≥2 members ⇒ no candidate pairs at all; return a
            # TYPED empty edges Dataset (from_items([]) has no schema and
            # breaks downstream decision filters)
            import ray.data as rd

            return rd.from_arrow(_EDGE_SCHEMA.empty_table()), 0
        # singleton-bucket prune: fat rows whose block key can never pair
        # (35% of band rows on the dense sf0.1 fixture, more on sparse
        # corpora) are dropped BEFORE the fat hash exchange — exactly
        # output-preserving, see pairs.key_stats
        pairable_ref = ray.put(pairable)
        fat = fat.map_batches(
            _keep_block_keys, fn_kwargs={"allowed_ref": pairable_ref}, batch_format="pyarrow"
        )
    fat = fat.map_batches(
        _salt_batch, fn_kwargs={"hot": hot}, batch_format="pyarrow"
    )
    edges, dropped = hash_exchange_chained(
        fat,
        ["block_key", "salt"],
        lambda p: _pair_score_partition(p, cfg),
        num_partitions,
        ["left_id", "right_id"],
        _dedup_edges_partition,
        num_partitions,
        sum_col="dropped",
        arrow_fns=True,
    )
    return edges, dropped


def gate_metrics(edges_ds) -> dict:
    """Per-run routing metrics mirroring the reference's
    pipeline_run_metrics fields (validation/router.py:227-245).

    One streaming pass with per-batch partial counts (no shuffle)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["decision"])
        return pa.table(
            {
                "decision": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts: dict[str, int] = {}
    for row in edges_ds.map_batches(partial, batch_format="pyarrow").take_all():
        counts[row["decision"]] = counts.get(row["decision"], 0) + row["n"]
    # post-validation edges carry llm_approve/llm_reject (stages/validate
    # rewrites gray-zone 'review' rows) — they must count toward totals and
    # the gray-zone figures, or every metric shrinks when validation is on
    llm_match = counts.get("llm_approve", 0)
    llm_no_match = counts.get("llm_reject", 0)
    approved = counts.get("auto_approve", 0) + counts.get("gray_approve", 0) + llm_match
    review = counts.get("review", 0)
    rejected = counts.get("reject", 0) + llm_no_match
    total = approved + review + rejected
    llm_ran = (llm_match + llm_no_match) > 0
    return {
        "total_candidates": total,
        "auto_match_count": counts.get("auto_approve", 0),
        "auto_reject_count": counts.get("reject", 0),
        "gray_zone_sent_count": counts.get("gray_approve", 0)
        + review
        + llm_match
        + llm_no_match,
        "llm_match_count": llm_match,
        "llm_no_match_count": llm_no_match,
        "llm_review_count": review,
        "llm_call_count": llm_match + llm_no_match,
        "llm_error_count": 0,
        "llm_invalid_json_retry_count": 0,
        "llm_avg_latency_ms": None,
        "llm_fallback_mode": None,
        "llm_disabled_reason": None if llm_ran else "llm_unavailable",
        "approved_count": approved,
    }
