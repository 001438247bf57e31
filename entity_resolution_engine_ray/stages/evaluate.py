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
import pyarrow.compute as pc

from entity_resolution_engine_ray.stages.exchange import hash_exchange_map_groups

_PRED = np.int64(1)
_TRUTH = np.int64(2)


def block_pairs(
    ds,
    id_col: str,
    key_col: str,
    num_partitions: int | None = None,
    payload_cols: list[str] | None = None,
    max_block_size: int | None = None,
):
    """All unordered intra-key id pairs (left < right), one hash exchange on
    ``key_col``. Each id carries exactly one key, so every pair is emitted
    at most once — no dedup pass needed. (Meta-blocking callers feed one key
    per SCHEME per id — then a pair is emitted once per co-blocking scheme,
    which is exactly the co-occurrence count those callers aggregate.)

    ``payload_cols``: per-doc attribute columns to carry onto the pair rows
    as ``left_<c>`` / ``right_<c>`` — agreement-pattern features come out of
    the SAME exchange instead of two extra attribute cogroups (the docs are
    already co-resident in the pair-generating partition).

    ``max_block_size``: block PURGING (the meta-blocking pre-step): keys
    with more than this many ids emit no pairs at all. Purging is part of
    the measured scheme's semantics (the SQL oracle applies the same band),
    not a silent cap — leave None for evaluation callers, where a hot key's
    pair explosion is the signal being measured."""
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
            if c < 2 or (max_block_size is not None and c > max_block_size):
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


def sorted_neighborhood_pairs(
    ds,
    id_col: str,
    key_col: str,
    window: int,
    num_partitions: int | None = None,
):
    """Sorted-neighborhood blocking (Hernández–Stolfo merge/purge): sort all
    records by (``key_col``, ``id_col``), slide a window of size ``window``
    over the global order, and emit every unordered pair whose global-rank
    gap is in [1, window-1]. Output: (left_id, right_id, gap) with left =
    the LOWER-rank record — ROW_NUMBER self-join semantics, so the SQL
    oracle mirrors it exactly.

    Distribution: one distributed sort (ranks come from block METADATA only
    — stages/scan.grouped_prefix_sum), then one slim (id:int64, rk:int64)
    exchange. Each record replicates to its native rank-bucket ⌊(rk-1)/w⌋
    and the previous one, so any pair with gap ≤ w-1 is co-resident in the
    LEFT record's native bucket and generated exactly once (by the native-
    left rule). No skew by construction: a bucket holds ≤ 2w rows whatever
    the key distribution — the classic argument for sorted-neighborhood
    over standard blocking on skewed keys. Output is O(N·w) rows.
    """
    import ray.data as rd

    from entity_resolution_engine_ray.stages.scan import grouped_prefix_sum

    if window < 2:
        return rd.from_arrow(
            pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                    "gap": pa.array([], pa.int64()),
                }
            )
        )

    def slim(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "id": t[id_col].cast(pa.int64()),
                "k": t[key_col],
                "one": pa.array(np.ones(n, dtype=np.int64)),
                "g": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    ranked = grouped_prefix_sum(
        ds.map_batches(slim, batch_format="pyarrow"), ["g"], ["k", "id"], "one", "rk"
    )

    w = int(window)

    def to_buckets(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = t["rk"].to_numpy(zero_copy_only=False).astype(np.int64)
        native = (rk - 1) // w
        bucket = np.concatenate([native, native - 1])
        ids2 = np.concatenate([ids, ids])
        rk2 = np.concatenate([rk, rk])
        keep = bucket >= 0
        return pa.table(
            {"id": ids2[keep], "rk": rk2[keep], "bucket": bucket[keep]}
        )

    buckets = ranked.map_batches(to_buckets, batch_format="pyarrow")

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype="int64"),
                    "right_id": pd.Series([], dtype="int64"),
                    "gap": pd.Series([], dtype="int64"),
                }
            )
        ls, rs, gs = [], [], []
        for b, grp in pdf.groupby("bucket", sort=False):
            grp = grp.sort_values("rk", kind="mergesort")
            rk = grp["rk"].to_numpy(dtype=np.int64)
            ids = grp["id"].to_numpy(dtype=np.int64)
            n = len(grp)
            # ranks in a bucket are consecutive global ranks, so the row at
            # position i+g is exactly the rank-(rk[i]+g) record
            native = (rk - 1) // w == b
            for g in range(1, w):
                if n <= g:
                    break
                li = np.nonzero(native[: n - g])[0]
                if len(li) == 0:
                    continue
                ls.append(ids[li])
                rs.append(ids[li + g])
                gs.append(np.full(len(li), g, dtype=np.int64))
        if not ls:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype="int64"),
                    "right_id": pd.Series([], dtype="int64"),
                    "gap": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "left_id": np.concatenate(ls),
                "right_id": np.concatenate(rs),
                "gap": np.concatenate(gs),
            }
        )

    return hash_exchange_map_groups(
        buckets, ["bucket"], gen, num_partitions=num_partitions
    )


def meta_blocking_wep(
    keyed_ds,
    id_col: str,
    key_col: str,
    max_block_size: int = 100,
    num_partitions: int | None = None,
):
    """Meta-blocking with Weight Edge Pruning (Papadakis et al.): records
    carry one blocking key per SCHEME (several rows per id in ``keyed_ds``);
    a candidate pair's weight is the number of schemes in which it
    co-blocks (CBS — common blocks scheme); pairs with weight strictly
    above the global mean weight survive. Oversized blocks are purged first
    (``max_block_size`` — block purging, the standard meta-blocking
    pre-step).

    Distribution: one key exchange emits pair co-occurrences (block_pairs —
    purge happens inside the same exchange since a key's ids are
    co-resident), one pair-key exchange folds them to (pair, weight), the
    mean is O(batch) integer partials, and the prune is a map-side filter
    against the broadcast mean. The mean is the SAME integer division the
    SQL oracle performs, so the strict-> comparison is bit-identical.

    Returns (survivors Dataset(left_id, right_id, weight), stats dict with
    n_pairs / total_weight / mean_weight)."""
    occ = block_pairs(
        keyed_ds, id_col, key_col,
        num_partitions=num_partitions, max_block_size=max_block_size,
    )

    def weigh(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype="int64"),
                    "right_id": pd.Series([], dtype="int64"),
                    "weight": pd.Series([], dtype="int64"),
                }
            )
        g = pdf.groupby(["left_id", "right_id"], sort=False).size().reset_index(name="weight")
        g["weight"] = g["weight"].astype(np.int64)
        return g

    weights = hash_exchange_map_groups(
        occ, ["left_id", "right_id"], weigh, num_partitions=num_partitions
    ).materialize()

    def partial(t: pa.Table) -> pa.Table:
        wsum = int(pc.sum(t["weight"]).as_py() or 0)
        return pa.table({"tw": pa.array([wsum], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    stats = weights.map_batches(partial, batch_format="pyarrow").to_pandas()
    # a 0-row Dataset SKIPS lazy map_batches, so the partial columns may be
    # absent entirely (the source schema leaks through) — treat as zero
    n_pairs = int(stats["n"].sum()) if "n" in stats else 0
    total_w = int(stats["tw"].sum()) if "tw" in stats else 0
    mean_w = (total_w / n_pairs) if n_pairs else 0.0

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["weight"], pa.scalar(mean_w, pa.float64())))

    return (
        weights.map_batches(prune, batch_format="pyarrow"),
        {"n_pairs": n_pairs, "total_weight": total_w, "mean_weight": mean_w},
    )


def clustering_agreement_stats(
    ds,
    pred_col: str,
    truth_col: str,
    num_partitions: int | None = None,
) -> dict:
    """External clustering-agreement statistics between two labelings of the
    same records (predicted clusters vs gold clusters): the six integers
    every pairwise metric and the Adjusted Rand Index are built from.

        n              total records
        pred_clusters  distinct predicted cluster keys
        truth_clusters distinct truth cluster keys
        cell_pairs     SN = Σ_ij C(n_ij, 2) over contingency cells
                       (= pairwise TP: together in both labelings)
        pred_pairs     SA = Σ_i C(a_i, 2) over predicted cluster sizes
        truth_pairs    SB = Σ_j C(b_j, 2) over truth cluster sizes

    Pairwise precision = SN/SA, recall = SN/SB, and
    ARI = (SN − SA·SB/T) / ((SA+SB)/2 − SA·SB/T) with T = C(n, 2)
    (Hubert–Arabie adjusted Rand) — all single float expressions over these
    exact integers, so an SQL oracle computing the same expressions matches
    bit-for-bit.

    Distribution: ONE record-scale exchange on (pred, truth) folds records
    into contingency cells; cluster sizes then come from two exchanges over
    the CELL table (O(clusters) rows, not O(records)); everything else is
    per-batch integer partials. Counts accumulate in Python ints on the
    driver (a handful of partial rows), so no int64 overflow at any corpus
    size that fits the int64 cell counts themselves."""

    def cell_count(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "pk": pd.Series([], dtype="object"),
                    "tk": pd.Series([], dtype="object"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        g = (
            pdf.groupby([pred_col, truth_col], sort=False)
            .size()
            .reset_index(name="c")
        )
        g.columns = ["pk", "tk", "c"]
        g["c"] = g["c"].astype(np.int64)
        return g

    cells = hash_exchange_map_groups(
        ds, [pred_col, truth_col], cell_count, num_partitions=num_partitions
    ).materialize()

    def cell_partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([int(c.sum())], pa.int64()),
                "sn": pa.array([int((c * (c - 1) // 2).sum())], pa.int64()),
            }
        )

    cp = cells.map_batches(cell_partial, batch_format="pyarrow").to_pandas()
    # 0-row Datasets skip lazy map_batches → partial columns may be absent
    n = int(cp["n"].sum()) if "n" in cp else 0
    sn = int(cp["sn"].sum()) if "sn" in cp else 0

    def size_fold(key: str):
        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) == 0:
                return pd.DataFrame(
                    {"pairs": pd.Series([], dtype="int64"),
                     "k": pd.Series([], dtype="int64")}
                )
            sizes = pdf.groupby(key, sort=False)["c"].sum().to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "pairs": [int((sizes * (sizes - 1) // 2).sum())],
                    "k": [len(sizes)],
                }
            )
        return fold

    # cluster sizes from the (small) cell table: a_i = Σ_j n_ij, b_j = Σ_i n_ij
    pp = hash_exchange_map_groups(
        cells, ["pk"], size_fold("pk"), num_partitions=num_partitions
    ).to_pandas()
    tp_ = hash_exchange_map_groups(
        cells, ["tk"], size_fold("tk"), num_partitions=num_partitions
    ).to_pandas()
    return {
        "n": n,
        "pred_clusters": int(pp["k"].sum()) if len(pp) else 0,
        "truth_clusters": int(tp_["k"].sum()) if len(tp_) else 0,
        "cell_pairs": sn,
        "pred_pairs": int(pp["pairs"].sum()) if len(pp) else 0,
        "truth_pairs": int(tp_["pairs"].sum()) if len(tp_) else 0,
    }


def block_filtering_pairs(
    keyed_ds,
    id_col: str,
    key_col: str,
    ratio_num: int = 4,
    ratio_den: int = 5,
    num_partitions: int | None = None,
):
    """Block filtering (Papadakis et al.): each record keeps only its
    ⌈r·|blocks(e)|⌉ SMALLEST blocks (smaller block ⇒ more discriminative
    key), ties broken by key string; a candidate pair survives if it
    co-occurs in at least one block BOTH records retained. Output:
    (left_id, right_id, weight) with weight = number of co-retained blocks.

    The ratio is the exact rational ``ratio_num/ratio_den`` and the keep
    count is the INTEGER ceiling ``(ratio_num·cnt + ratio_den − 1) //
    ratio_den`` — never a float multiply (0.8·5 in binary floats ceils to 5,
    not 4; the SQL oracle uses the same integer form, so both engines keep
    identical memberships).

    Distribution: three record-scale exchanges — (1) on key to attach block
    sizes to memberships, (2) on id to rank each record's blocks and keep
    the head, (3) the retained memberships through ``block_pairs`` + a pair
    fold. Skew note: step 3 only ever pairs within retained blocks, and
    filtering preferentially DROPS the hot oversized blocks, so the pair
    stage is strictly cheaper than pairing the raw blocking."""
    if ratio_num <= 0 or ratio_den <= 0 or ratio_num > ratio_den:
        raise ValueError("ratio must satisfy 0 < ratio_num/ratio_den <= 1")

    def attach_size(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "id": pd.Series([], dtype="int64"),
                    "k": pd.Series([], dtype="object"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        out = pd.DataFrame(
            {"id": pdf[id_col].astype(np.int64), "k": pdf[key_col]}
        )
        out["c"] = pdf.groupby(key_col, sort=False)[id_col].transform("size").astype(np.int64)
        return out

    sized = hash_exchange_map_groups(
        keyed_ds, [key_col], attach_size, num_partitions=num_partitions
    )

    def keep_head(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "k": pd.Series([], dtype="object")}
            )
        pdf = pdf.sort_values(["id", "c", "k"], kind="mergesort")
        rank = pdf.groupby("id", sort=False).cumcount()
        cnt = pdf.groupby("id", sort=False)["k"].transform("size").to_numpy(dtype=np.int64)
        keep = (ratio_num * cnt + ratio_den - 1) // ratio_den
        return pdf.loc[rank.to_numpy() < keep, ["id", "k"]]

    retained = hash_exchange_map_groups(
        sized, ["id"], keep_head, num_partitions=num_partitions
    )

    occ = block_pairs(retained, "id", "k", num_partitions=num_partitions)

    def weigh(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype="int64"),
                    "right_id": pd.Series([], dtype="int64"),
                    "weight": pd.Series([], dtype="int64"),
                }
            )
        g = pdf.groupby(["left_id", "right_id"], sort=False).size().reset_index(name="weight")
        g["weight"] = g["weight"].astype(np.int64)
        return g

    return hash_exchange_map_groups(
        occ, ["left_id", "right_id"], weigh, num_partitions=num_partitions
    )


def candidate_pattern_counts(cand_ds, num_partitions: int | None = None) -> pd.DataFrame:
    """Per agreement-pattern candidate counts WITHOUT labels (the input to
    unsupervised EM): per-batch integer partials into one tiny pattern
    groupby — no pair ever leaves its batch, output is O(patterns) rows."""

    def partial(t: pa.Table) -> pa.Table:
        pat = t["pattern"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnt = np.unique(pat, return_counts=True)
        return pa.table(
            {"pattern": pa.array(vals), "n": pa.array(cnt.astype(np.int64))}
        )

    partials = cand_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {"pattern": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64")}
        )
    return (
        partials.groupby("pattern", as_index=False)["n"]
        .sum()
        .astype({"pattern": np.int64, "n": np.int64})
        .sort_values("pattern", kind="mergesort")
        .reset_index(drop=True)
    )


def fs_em(
    pattern_counts: pd.DataFrame,
    n_features: int,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    iters: int = 200,
    tol: float = 1e-12,
) -> dict:
    """UNSUPERVISED Fellegi–Sunter parameter estimation by EM over the
    agreement-pattern counts (the Splink/fastLink core: Winkler 1988's EM
    for the record-linkage mixture under conditional independence). The
    whole algorithm runs on the O(2^k) aggregated pattern-count table —
    the distributed work is candidate_pattern_counts; EM itself never
    touches a pair, so it is driver-side by design at any corpus size.

    ``pattern_counts``: (pattern bitmask int64, n int64) — bit j set means
    feature j agrees on the pair. Returns {"lam", "m", "u", "iters"} with
    m/u arrays of length ``n_features``. Deterministic: fixed init, fixed
    iteration order, float64 throughout."""
    pats = pattern_counts["pattern"].to_numpy(dtype=np.int64)
    ns = pattern_counts["n"].to_numpy(dtype=np.float64)
    k = int(n_features)
    bits = ((pats[:, None] >> np.arange(k)[None, :]) & 1).astype(np.float64)  # (P, k)
    lam = float(lam0)
    m = np.full(k, float(m0))
    u = np.full(k, float(u0))
    eps = 1e-12
    total = ns.sum()
    it = 0
    for it in range(1, iters + 1):
        # E: responsibility per pattern
        pm = lam * np.prod(np.where(bits == 1.0, m[None, :], 1.0 - m[None, :]), axis=1)
        pu = (1.0 - lam) * np.prod(
            np.where(bits == 1.0, u[None, :], 1.0 - u[None, :]), axis=1
        )
        gamma = pm / np.maximum(pm + pu, eps)
        # M: weighted proportions
        wm = ns * gamma
        wu = ns * (1.0 - gamma)
        new_lam = wm.sum() / max(total, eps)
        new_m = (bits * wm[:, None]).sum(axis=0) / max(wm.sum(), eps)
        new_u = (bits * wu[:, None]).sum(axis=0) / max(wu.sum(), eps)
        new_m = np.clip(new_m, eps, 1.0 - eps)
        new_u = np.clip(new_u, eps, 1.0 - eps)
        delta = max(
            abs(new_lam - lam), float(np.abs(new_m - m).max()), float(np.abs(new_u - u).max())
        )
        lam, m, u = new_lam, new_m, new_u
        if delta < tol:
            break
    return {"lam": float(lam), "m": m, "u": u, "iters": it}


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
