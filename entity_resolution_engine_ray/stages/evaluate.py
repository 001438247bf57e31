"""Pair-set evaluation: precision/recall of a predicted duplicate-pair set
against a truth pair set, fully distributed.

The record-linkage methodology loop (pick a blocking scheme -> measure its
pair recall against verified near-dup truth -> iterate) needs this as a
first-class operator: at web scale neither pair set fits on the driver, so
the TP/FP/FN intersection is ONE hash exchange on the canonical (left, right)
pair key, with per-partition bitmask-OR grouping and O(partitions) count
partials returned — the driver only ever sees a handful of integers.

Reference parity: the reference evaluates matcher quality serially in its
test suite — pair-level assertions over small in-memory frames
(/root/reference/tests/test_basic_mapping.py:59-66,
test_matches_matcher.py); this generalizes that check to corpus-scale pair
sets. Blocking-quality evaluation follows the standard reduction-ratio /
pairs-completeness framing of the record-linkage literature (e.g.
Christen's survey of indexing techniques); Fellegi–Sunter m/u estimation
(fs_pattern_counts) follows the 1969 theory as operationalized by
Splink-style tooling, conditioned on the blocked candidate set.

Scale notes:
- pair sets are exchanged ONCE, on (left, right); partials are 3 ints per
  partition, so output never grows with data size;
- `block_pairs` (the predicted-side generator) emits all intra-key pairs.
  Its cost is sum over keys of c*(c-1)/2 — the quantity a blocking scheme
  is DESIGNED to keep sub-quadratic; a scheme whose hot key explodes is
  exactly what the evaluation is there to reveal, so pairs are NOT capped
  (a cap would silently change the measured precision/recall). Callers
  profiling an untrusted scheme at full scale should pre-check key counts
  with an aggregate before generating pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_engine_ray.stages.exchange import hash_exchange_map_groups

_PRED = np.int64(1)
_TRUTH = np.int64(2)


def block_pairs(
    ds,
    id_col: str,
    key_col: str,
    num_partitions: int | None = None,
    payload_cols: list[str] | None = None,
):
    """All unordered intra-key id pairs (left < right), one hash exchange on
    ``key_col``. Each id carries exactly one key, so every pair is emitted
    at most once — no dedup pass needed.

    ``payload_cols``: per-doc attribute columns to carry onto the pair rows
    as ``left_<c>`` / ``right_<c>`` — agreement-pattern features come out of
    the SAME exchange instead of two extra attribute cogroups (the docs are
    already co-resident in the pair-generating partition)."""
    payload = list(payload_cols or [])
    empty_cols: dict = {"left_id": pd.Series([], dtype="int64"),
                        "right_id": pd.Series([], dtype="int64")}

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            out = dict(empty_cols)
            for c in payload:
                out[f"left_{c}"] = pdf[c] if c in pdf else pd.Series([], dtype=object)
                out[f"right_{c}"] = out[f"left_{c}"]
            return pd.DataFrame(out)
        li_all, ri_all = [], []
        pdf = pdf.sort_values([key_col, id_col], kind="mergesort").reset_index(drop=True)
        for _, grp in pdf.groupby(key_col, sort=False):
            c = len(grp)
            if c < 2:
                continue
            iu = np.triu_indices(c, k=1)
            base = grp.index.to_numpy()
            li_all.append(base[iu[0]])
            ri_all.append(base[iu[1]])
        if not li_all:
            out = dict(empty_cols)
            for c in payload:
                out[f"left_{c}"] = pd.Series([], dtype=pdf[c].dtype)
                out[f"right_{c}"] = pd.Series([], dtype=pdf[c].dtype)
            return pd.DataFrame(out)
        li = np.concatenate(li_all)
        ri = np.concatenate(ri_all)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        out = {"left_id": ids[li], "right_id": ids[ri]}
        for c in payload:
            vals = pdf[c].to_numpy()
            out[f"left_{c}"] = vals[li]
            out[f"right_{c}"] = vals[ri]
        return pd.DataFrame(out)

    return hash_exchange_map_groups(
        ds.select_columns([id_col, key_col] + payload), [key_col], gen,
        num_partitions=num_partitions,
    )


def evaluate_pair_sets(pred_ds, truth_ds, num_partitions: int | None = None) -> dict:
    """TP/FP/FN of ``pred_ds`` against ``truth_ds`` (both: left_id < right_id
    int64 columns). One hash exchange on the pair key; returns plain ints."""

    def tag(side: np.int64):
        def _t(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "left_id": t["left_id"].cast(pa.int64()),
                    "right_id": t["right_id"].cast(pa.int64()),
                    "side": pa.array(np.full(len(t), side, dtype=np.int64)),
                }
            )

        return _t

    tagged = (
        pred_ds.map_batches(tag(_PRED), batch_format="pyarrow")
        .union(truth_ds.map_batches(tag(_TRUTH), batch_format="pyarrow"))
    )

    def count_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"tp": [0], "fp": [0], "fn": [0]})
        mask = pdf.groupby(["left_id", "right_id"], sort=False)["side"].sum()
        # a pair appears at most once per side, so the sum IS the bitmask
        vals = mask.to_numpy()
        return pd.DataFrame(
            {
                "tp": [int((vals == _PRED + _TRUTH).sum())],
                "fp": [int((vals == _PRED).sum())],
                "fn": [int((vals == _TRUTH).sum())],
            }
        )

    partials = hash_exchange_map_groups(
        tagged, ["left_id", "right_id"], count_partition,
        num_partitions=num_partitions,
    ).to_pandas()  # O(num_partitions) rows — bounded, never data-sized
    return {
        "tp": int(partials["tp"].sum()),
        "fp": int(partials["fp"].sum()),
        "fn": int(partials["fn"].sum()),
    }


def fs_pattern_counts(cand_ds, truth_ds, num_partitions: int | None = None) -> pd.DataFrame:
    """Fellegi–Sunter pattern counts: per agreement pattern, how many
    candidate pairs are matches (in the truth set) vs non-matches.

    ``cand_ds``: (left_id, right_id, pattern int64) — pattern is the
    caller's encoded agreement vector. ``truth_ds``: (left_id, right_id).
    ONE hash exchange on the pair key with bitmask-OR grouping (the
    evaluate_pair_sets layout plus a pattern payload); per-partition output
    is O(patterns) count rows, so nothing data-sized reaches the driver.
    Estimation is CONDITIONED ON THE CANDIDATE SET (truth-only pairs the
    blocking missed are excluded) — the standard practical regime for m/u
    estimation over blocked comparisons."""

    def tag_cand(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_id": t["left_id"].cast(pa.int64()),
                "right_id": t["right_id"].cast(pa.int64()),
                "side": pa.array(np.full(len(t), _PRED, dtype=np.int64)),
                "pattern": t["pattern"].cast(pa.int64()),
            }
        )

    def tag_truth(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_id": t["left_id"].cast(pa.int64()),
                "right_id": t["right_id"].cast(pa.int64()),
                "side": pa.array(np.full(len(t), _TRUTH, dtype=np.int64)),
                "pattern": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        )

    tagged = cand_ds.map_batches(tag_cand, batch_format="pyarrow").union(
        truth_ds.map_batches(tag_truth, batch_format="pyarrow")
    )

    def count_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "pattern": pd.Series([], dtype="int64"),
                    "n_match": pd.Series([], dtype="int64"),
                    "n_nonmatch": pd.Series([], dtype="int64"),
                }
            )
        g = pdf.groupby(["left_id", "right_id"], sort=False).agg(
            side=("side", "sum"), pattern=("pattern", "max")
        )
        g = g[g["side"] != _TRUTH]  # truth-only: blocking missed it — excluded
        is_match = (g["side"] == _PRED + _TRUTH).to_numpy()
        pat = g["pattern"].to_numpy()
        rows = {}
        for p in np.unique(pat):
            sel = pat == p
            rows[int(p)] = (int((sel & is_match).sum()), int((sel & ~is_match).sum()))
        return pd.DataFrame(
            {
                "pattern": np.fromiter(rows.keys(), dtype=np.int64),
                "n_match": np.fromiter((v[0] for v in rows.values()), dtype=np.int64),
                "n_nonmatch": np.fromiter((v[1] for v in rows.values()), dtype=np.int64),
            }
        )

    partials = hash_exchange_map_groups(
        tagged, ["left_id", "right_id"], count_partition,
        num_partitions=num_partitions,
    ).to_pandas()  # O(partitions x patterns) rows — bounded
    return (
        partials.groupby("pattern", as_index=False)[["n_match", "n_nonmatch"]]
        .sum()
        .astype({"pattern": np.int64, "n_match": np.int64, "n_nonmatch": np.int64})
        .sort_values("pattern", kind="mergesort")
        .reset_index(drop=True)
    )


def blocking_eval_row(scheme: str, counts: dict) -> dict:
    """One report row. Ratios are single divisions of the SAME integers the
    SQL oracle divides (f1 in the 2*tp/(n_pred+n_truth) form), so the
    doubles are bit-identical across engines."""
    tp, fp, fn = counts["tp"], counts["fp"], counts["fn"]
    n_pred, n_truth = tp + fp, tp + fn
    return {
        "scheme": scheme,
        "n_pred": n_pred,
        "n_truth": n_truth,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": (tp / n_pred) if n_pred else 0.0,
        "recall": (tp / n_truth) if n_truth else 0.0,
        "f1": (2.0 * tp / (n_pred + n_truth)) if (n_pred + n_truth) else 0.0,
    }
