"""One-to-one record linkage assignment: greedy maximum-weight bipartite
matching over scored candidate pairs, distributed.

The reference's matchers enforce per-left argmax only
(/root/reference/entity_resolution_engine/matching/teams.py keeps each alpha record's best
beta candidate), which allows two alpha records to claim the same beta. A
record-linkage DELIVERABLE usually needs a one-to-one assignment: each
left entity matched to at most one right entity and vice versa, best
scores first. The canonical cheap answer is the greedy matching — process
pairs in (score desc, left, right) order, accept a pair iff both endpoints
are still free (2-approximation of the optimal weighted matching, and the
de-facto standard in ER pipelines).

The serial scan is order-sequential, but the greedy matching has an
order-free characterization (Preis 1999, "locally heaviest edges"): a pair
is in the greedy matching iff it is the BEST REMAINING pair of BOTH its
endpoints after deleting all earlier-accepted pairs' endpoints. So rounds
of "accept every mutual-best pair, drop every pair touching a matched
endpoint" converge to EXACTLY the serial greedy result whenever the
comparator is a strict total order — here (score desc, left asc, right
asc), which ties floats deterministically.

Distribution per round (pairs ds of (left, right, score)):
  1. exchange on left  → per-left best pair      (O(P) slim rows)
  2. exchange on right → per-right best pair     (O(P))
  3. exchange the two best-sets on (left, right) → mutual = accepted
  4. two cogroups remove pairs touching accepted endpoints
Each round removes at least the global best remaining pair, and in
practice a constant fraction of all pairs; a rank-chain adversarial input
degrades to O(chain length) rounds, so ``max_rounds`` guards and the
driver finish (below) makes the guard unreachable for any input whose
tail fits one worker.

Size gate: when the remaining pair count drops to
``driver_finish_threshold`` the tail runs as ONE serial greedy scan on the
driver (same comparator, so the composition is still exactly the greedy
matching — the same driver-local vs distributed gate the clustering stage
uses, pipelines/pages_er.py:131-137).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_engine_ray.stages.exchange import (
    hash_exchange_cogroup,
    hash_exchange_map_groups,
)

_EMPTY = {
    "left_id": pd.Series([], dtype="int64"),
    "right_id": pd.Series([], dtype="int64"),
    "score": pd.Series([], dtype="float64"),
}


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({k: v.copy() for k, v in _EMPTY.items()})


def _best_per(key: str):
    """Per-``key`` best pair under (score desc, left asc, right asc)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return _empty_pairs()
        pdf = pdf.sort_values(
            [key, "score", "left_id", "right_id"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        return pdf.drop_duplicates(key, keep="first")[
            ["left_id", "right_id", "score"]
        ]

    return fold


def serial_greedy_match(pairs: pd.DataFrame) -> pd.DataFrame:
    """The serial oracle: one (score desc, left, right) scan accepting pairs
    whose endpoints are both free. Used as the driver finish AND as the
    test pin for the distributed rounds."""
    if len(pairs) == 0:
        return _empty_pairs()
    pairs = pairs.sort_values(
        ["score", "left_id", "right_id"],
        ascending=[False, True, True],
        kind="mergesort",
    )
    taken_l: set = set()
    taken_r: set = set()
    keep = np.zeros(len(pairs), dtype=bool)
    ls = pairs["left_id"].to_numpy()
    rs = pairs["right_id"].to_numpy()
    for i in range(len(pairs)):
        if ls[i] not in taken_l and rs[i] not in taken_r:
            keep[i] = True
            taken_l.add(ls[i])
            taken_r.add(rs[i])
    out = pairs.loc[keep].reset_index(drop=True)
    out["left_id"] = out["left_id"].astype(np.int64)
    out["right_id"] = out["right_id"].astype(np.int64)
    return out


def one_to_one_match(
    pairs_ds,
    num_partitions: int | None = None,
    driver_finish_threshold: int = 2_000_000,
    max_rounds: int = 100,
):
    """Greedy 1:1 assignment over a Dataset of (left_id:int64,
    right_id:int64, score:float64) candidate pairs. Returns a Dataset
    (left_id, right_id, score) — the accepted matching. The result set is
    EXACTLY ``serial_greedy_match`` of the full input, independent of
    partitioning; only the accepted matching's Datasets are ever unioned,
    never collected on the driver (the matching itself is O(records) — the
    driver only sees it if the CALLER converts)."""
    import ray.data as rd

    accepted: list = []
    pairs = pairs_ds.select_columns(["left_id", "right_id", "score"]).materialize()

    for _ in range(max_rounds):
        n = pairs.count()
        if n == 0:
            break
        if n <= driver_finish_threshold:
            tail = serial_greedy_match(pairs.to_pandas())
            if len(tail):
                accepted.append(rd.from_pandas(tail))
            break

        lbest = hash_exchange_map_groups(
            pairs, ["left_id"], _best_per("left_id"), num_partitions=num_partitions
        )
        rbest = hash_exchange_map_groups(
            pairs, ["right_id"], _best_per("right_id"), num_partitions=num_partitions
        )

        def mutual(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            if len(lpdf) == 0 or len(rpdf) == 0:
                return _empty_pairs()
            return lpdf.merge(rpdf[["left_id", "right_id"]], on=["left_id", "right_id"])

        matched = hash_exchange_cogroup(
            lbest, rbest, ["left_id", "right_id"], ["left_id", "right_id"], mutual,
            num_partitions=num_partitions,
        ).materialize()
        if matched.count() == 0:
            # can only happen on empty remaining input (the global best
            # remaining pair is always mutual-best) — defensive break
            break
        accepted.append(matched)

        def drop_touched(side_col: str):
            def fn(ppdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
                if len(ppdf) == 0:
                    return _empty_pairs()
                if len(mpdf) == 0:
                    return ppdf[["left_id", "right_id", "score"]]
                return ppdf.loc[
                    ~ppdf[side_col].isin(set(mpdf[side_col].tolist())),
                    ["left_id", "right_id", "score"],
                ]

            return fn

        pairs = hash_exchange_cogroup(
            pairs, matched, ["left_id"], ["left_id"], drop_touched("left_id"),
            num_partitions=num_partitions,
        )
        pairs = hash_exchange_cogroup(
            pairs, matched, ["right_id"], ["right_id"], drop_touched("right_id"),
            num_partitions=num_partitions,
        ).materialize()
    else:
        raise RuntimeError(
            f"one_to_one_match did not converge in {max_rounds} rounds; "
            "raise max_rounds or driver_finish_threshold"
        )

    if not accepted:
        return rd.from_pandas(_empty_pairs())
    out = accepted[0]
    for ds in accepted[1:]:
        out = out.union(ds)
    return out
