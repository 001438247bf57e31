"""Stage 4 — pairwise scoring + three-way gate.

    score = w_j * token_jaccard  +  w_s * simhash_similarity  +  w_t * jaro_winkler(title)

Primary path: ``fused_edges_stage`` — ONE fat-block hash exchange carrying
(url_hash, token_ids, simhash, title_norm) per band row (IDS ONLY: url
strings never enter the pair shuffle, the scored output, or the edge-dedup
exchange — they rejoin from the features side table after clustering);
each partition generates pairs (salted, capped, drop-counted), pre-dedups,
and scores fully vectorized: SimHash via uint64 XOR + popcount, Jaccard
via the grouped int64 ``searchsorted`` kernel (``_grouped_jaccard``),
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
from entity_resolution_engine_ray.functions.similarity import jaro_winkler, jaro_winkler_batch


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


def _jw_unique_pairs(titles_l: np.ndarray, titles_r: np.ndarray) -> np.ndarray:
    """Jaro-Winkler per pair, computed once per UNIQUE (left, right) title
    pair via factorize + the vectorized batch kernel."""
    import pandas as pd

    ca, ua = pd.factorize(titles_l)
    cb, ub = pd.factorize(titles_r)
    code = ca.astype(np.int64) * np.int64(len(ub)) + cb
    uniq, inv = np.unique(code, return_inverse=True)
    jw_u = jaro_winkler_batch(ua[uniq // len(ub)], ub[uniq % len(ub)])
    return jw_u[inv]


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


def _grouped_jaccard(
    arrs: np.ndarray, lens: np.ndarray, lidx: np.ndarray, ridx: np.ndarray
) -> np.ndarray:
    """Exact Jaccard over sorted-unique int64 token-id arrays for a pair
    list, vectorized by LEFT doc: one ``searchsorted`` per (left doc,
    concatenated partners) group instead of one Python set op per pair —
    all hot work is sequential numpy over int arrays (no Python string/set
    objects, which thrash worker heaps under full-node concurrency)."""
    n = len(lidx)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    order = np.argsort(lidx, kind="stable")
    lo, ro = lidx[order], ridx[order]
    bounds = np.r_[0, np.flatnonzero(lo[1:] != lo[:-1]) + 1, n]
    inter = np.zeros(n, dtype=np.int64)
    for gi in range(len(bounds) - 1):
        s, e = bounds[gi], bounds[gi + 1]
        A = arrs[lo[s]]
        if len(A) == 0:
            continue
        parts = [arrs[r] for r in ro[s:e]]
        blens = np.fromiter((len(b) for b in parts), dtype=np.int64, count=len(parts))
        nz = np.flatnonzero(blens)
        if len(nz) == 0:
            continue
        cat = np.concatenate([parts[i] for i in nz])
        pos = np.searchsorted(A, cat)
        pos[pos >= len(A)] = len(A) - 1
        hit = (A[pos] == cat).astype(np.int64)
        # reduceat is undefined for zero-length segments — they were filtered
        # out above and stay at inter == 0
        cuts = np.r_[0, np.cumsum(blens[nz])[:-1]]
        inter[s + nz] = np.add.reduceat(hit, cuts)
    la, lb = lens[lo], lens[ro]
    union = la + lb - inter
    jac_o = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    jac = np.empty(n, dtype=np.float64)
    jac[order] = jac_o
    return jac


def _pair_score_partition(pdf, cfg: PagesERConfig):
    """One hash partition of fat (block_key, salt) sub-blocks → scored,
    gated edges, IDS ONLY (left_id/right_id int64 url hashes — no url
    strings ride the pair shuffle or the edge output; urls rejoin from the
    features side table after clustering). Sub-block members order by
    url_hash — the serial oracle orders identically, so pair identity, cap
    truncation and left/right orientation stay in exact parity."""
    import pandas as pd

    pdf = pdf.sort_values(["block_key", "salt", "url_hash"], kind="mergesort")
    keys = pdf["block_key"].to_numpy()
    salts = pdf["salt"].to_numpy()
    url_hashes = pdf["url_hash"].to_numpy().astype(np.int64)
    toks = pdf["token_ids"].to_numpy()
    tok_lens = np.fromiter((len(a) for a in toks), dtype=np.int64, count=len(toks))
    sims = pdf["simhash"].to_numpy().astype(np.int64)
    titles = pdf["title_norm"].to_numpy()
    change = np.flatnonzero((keys[1:] != keys[:-1]) | (salts[1:] != salts[:-1])) + 1
    starts = np.r_[0, change]
    ends = np.r_[change, len(pdf)]
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
    cols = [
        "left_id", "right_id", "block_key", "score",
        "jaccard", "simhash_sim", "title_sim", "decision", "dropped",
    ]
    if not li:
        return pd.DataFrame(
            {
                c: pd.Series(
                    [],
                    dtype=(
                        np.float64
                        if c in ("score", "jaccard", "simhash_sim", "title_sim")
                        else (object if c == "decision" else np.int64)
                    ),
                )
                for c in cols
            }
        )
    lidx = np.concatenate(li)
    ridx = np.concatenate(ri)
    # partition-local pre-dedup (same pair emitted by several bands that
    # hashed into this partition): keep min block_key, skip re-scoring.
    # The global cross-partition dedup still runs downstream.
    okey = np.concatenate(okeys)
    pre = pd.DataFrame(
        {"l": url_hashes[lidx], "r": url_hashes[ridx], "k": okey, "li": lidx, "ri": ridx}
    )
    pre = pre.sort_values(["l", "r", "k"], kind="mergesort").drop_duplicates(["l", "r"], keep="first")
    lidx = pre["li"].to_numpy()
    ridx = pre["ri"].to_numpy()
    okeys = [pre["k"].to_numpy()]
    n = len(lidx)
    sim_sim = 1.0 - _popcount64(
        np.bitwise_xor(sims[lidx].astype(np.uint64), sims[ridx].astype(np.uint64))
    ) / 64.0
    jac = _grouped_jaccard(toks, tok_lens, lidx, ridx)
    jw = _jw_unique_pairs(titles[lidx], titles[ridx])

    score = cfg.weight_jaccard * jac + cfg.weight_simhash * sim_sim + cfg.weight_title * jw
    gray_label = "gray_approve" if cfg.fallback_mode == "auto_approve" else "review"
    decision = np.where(
        score < cfg.gate_low, "reject", np.where(score >= cfg.gate_high, "auto_approve", gray_label)
    )
    drops = np.zeros(n, dtype=np.int64)
    drops[0] = dropped
    return pd.DataFrame(
        {
            "left_id": url_hashes[lidx],
            "right_id": url_hashes[ridx],
            "block_key": np.concatenate(okeys),
            "score": score,
            "jaccard": jac,
            "simhash_sim": sim_sim,
            "title_sim": jw,
            "decision": decision,
            "dropped": drops,
        }
    )


def _dedup_edges_partition(pdf):
    """Keep the min-block_key instance of each scored pair (scores of
    duplicate instances are identical by construction). Keyed on the int64
    url-hash ids — 16-byte keys hash/sort far cheaper than url strings at
    web scale (pair sets reach ~80 rows/page on dense fixtures)."""
    pdf = pdf.sort_values(["left_id", "right_id", "block_key"], kind="mergesort")
    return pdf.drop_duplicates(["left_id", "right_id"], keep="first")


def fused_edges_stage(features_ds, cfg: PagesERConfig | None = None, num_partitions: int = 64):
    """features → scored+gated edge Dataset in two shuffles (fat-block
    sort shuffle + slim edge dedup), replacing the pairgen + 2-join + score
    chain. Returns (edges_ds, dropped_pair_count).

    The two shuffles are CHAINED (exchange.hash_exchange_chained): the edge
    dedup split for partition p is scheduled directly on the score reduce
    ref for p, so dedup starts the moment each score partition finishes —
    no driver barrier between the waves, and the per-partition dropped
    counts fold in via side tasks instead of a driver-side full-column scan."""
    from entity_resolution_engine_ray.stages.block import block_keys_stage, fat_block_rows_stage
    from entity_resolution_engine_ray.stages.exchange import hash_exchange_chained
    from entity_resolution_engine_ray.stages.pairs import _salt_batch, hot_key_splits

    cfg = cfg or PagesERConfig()
    features_ds = features_ds.materialize()
    hot = hot_key_splits(
        block_keys_stage(features_ds),  # key-only explode: 8 bytes/row
        cfg.max_block_size,
        n_rows_hint=features_ds.count() * cfg.bands,  # metadata-only count
    )
    fat = fat_block_rows_stage(features_ds).map_batches(
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
    approved = counts.get("auto_approve", 0) + counts.get("gray_approve", 0)
    review = counts.get("review", 0)
    rejected = counts.get("reject", 0)
    total = approved + review + rejected
    return {
        "total_candidates": total,
        "auto_match_count": counts.get("auto_approve", 0),
        "auto_reject_count": rejected,
        "gray_zone_sent_count": counts.get("gray_approve", 0) + review,
        "llm_match_count": 0,
        "llm_no_match_count": 0,
        "llm_review_count": review,
        "llm_call_count": 0,
        "llm_error_count": 0,
        "llm_invalid_json_retry_count": 0,
        "llm_avg_latency_ms": None,
        "llm_fallback_mode": None,
        "llm_disabled_reason": "llm_unavailable",
        "approved_count": approved,
    }
