"""Stage 4 — pairwise scoring (stateful actor pool) + three-way gate.

Features are attached to the pair list with two hash joins on url (the
small-per-pair alternative to shipping token lists once per band key), then
``PairScorer`` — a callable class → Ray actor pool — scores each pair:

    score = w_j * token_jaccard  +  w_s * simhash_similarity  +  w_t * jaro_winkler(title)

SimHash hamming similarity is fully vectorized (uint64 XOR + popcount over
the batch); Jaccard/JW run per pair on pre-tokenized, deduplicated arrays.

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
from entity_resolution_engine_ray.functions.similarity import jaro_winkler


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


class PairScorer:
    """Actor-pool batch scorer. Construction cost (config parse) runs once
    per actor; per-batch work is vectorized where the kernel allows."""

    def __init__(self, cfg: PagesERConfig | None = None):
        self.cfg = cfg or PagesERConfig()

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
        jw = np.empty(n, dtype=np.float64)
        for i in range(n):
            # tokens are "\x1f"-joined unique sorted token strings
            a = lt[i].split("\x1f") if lt[i] else []
            b = rt[i].split("\x1f") if rt[i] else []
            if not a and not b:
                jac[i] = 1.0
            elif not a or not b:
                jac[i] = 0.0
            else:
                sa = set(a)
                inter = sum(1 for t in b if t in sa)
                jac[i] = inter / (len(sa) + len(b) - inter)
            jw[i] = jaro_winkler(ltit[i], rtit[i])

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


def gate_metrics(edges_ds) -> dict:
    """Per-run routing metrics mirroring the reference's
    pipeline_run_metrics fields (validation/router.py:227-245)."""
    counts = {row["decision"]: row["count()"] for row in edges_ds.groupby("decision").count().iter_rows()}
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
