"""Edit-distance similarity self-join — symmetric-delete blocking + a
pair-vectorized Levenshtein verify.

The classic ER "fuzzy match on a dirty string domain" operator (reference
matchers score name similarity pairwise inside entity blocks —
`/root/reference/entity_resolution_engine/matchers/players_matcher.py` —
but the reference has no generic string-similarity JOIN; this is the
web-scale generalization). Published algorithm, public knowledge: the
deletion-neighbourhood blocking of FastSS (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007) / SymSpell — if
``levenshtein(a, b) <= t`` then the sets of strings reachable from ``a``
and from ``b`` by at most ``t`` character deletions intersect, so grouping
by deletion-variant key is a LOSSLESS candidate generator (no
edit-distance-``<=t`` pair can be missed; the verify step makes the final
answer exact).

Scale shape (100 TB): the join runs over the DISTINCT value domain (dedup
first — that is the caller's one-groupby contract, see
``q_part_fuzzy_names``), featurize emits O(n · L^t) slim rows
(variant-hash int64 + the string), candidates co-locate via ONE hash
exchange on the variant key, pair dedup + verify ride a second slim
exchange on the (key_a, key_b) pair — no all-pairs stage anywhere. Skewed
variant keys (a hot short substring) behave like any hot blocking key:
compose with the salting / counted-drop caps of ``stages/pairs`` if a
domain needs it; the default here is exact (no drops), which every oracle
run certifies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from entity_resolution_engine_ray.functions.similarity import stable_hash64
from entity_resolution_engine_ray.stages.grouping import partition_map_groups


def deletion_variants(s: str, max_dist: int) -> set[str]:
    """All strings reachable from ``s`` by deleting at most ``max_dist``
    characters (including ``s`` itself) — the FastSS neighbourhood."""
    outs = {s}
    frontier = {s}
    for _ in range(max_dist):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1 :])
        frontier = nxt - outs
        outs |= nxt
    return outs


def _encode_padded(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Strings → (n, max_len) uint32 codepoint matrix (zero-padded) + length
    vector, via one UTF-32 decode of the concatenated batch (the same
    vectorization trick as the char-ngram featurizer in stages/dedup)."""
    n = len(names)
    lens = np.fromiter((len(s) for s in names), dtype=np.int64, count=n)
    if n == 0 or int(lens.max(initial=0)) == 0:
        return np.zeros((n, 0), dtype=np.uint32), lens
    flat = np.frombuffer("".join(names).encode("utf-32-le"), dtype=np.uint32)
    out = np.zeros((n, int(lens.max())), dtype=np.uint32)
    off = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    rows = np.repeat(np.arange(n), lens)
    out[rows, np.arange(len(flat)) - off] = flat
    return out, lens


def levenshtein_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each aligned pair ``(a[i], b[i])``,
    vectorized ACROSS the pair axis: the DP loops over string positions
    (strings in a fuzzy-join domain are short — names, titles) while every
    arithmetic op covers the whole pair batch. The j-axis insertion chain
    — normally a serial scan — is the min-plus prefix trick:
    ``min_k<=j (cur[k] + (j-k)) = j + cummin(cur[k] - k)``, one
    ``np.minimum.accumulate`` per row instead of an inner Python loop."""
    if len(a) != len(b):
        raise ValueError(f"pair arrays differ in length: {len(a)} vs {len(b)}")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    A, la = _encode_padded(list(a))
    B, lb = _encode_padded(list(b))
    max_a = A.shape[1]
    width = B.shape[1] + 1
    ar = np.arange(width, dtype=np.int32)
    prev = np.tile(ar, (n, 1))
    res = np.empty(n, dtype=np.int64)
    res[la == 0] = lb[la == 0]
    rows = np.arange(n)
    for i in range(1, max_a + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        if width > 1:
            sub = prev[:, :-1] + (B != A[:, i - 1][:, None])
            cur[:, 1:] = np.minimum(sub, prev[:, 1:] + 1)
        cur = np.minimum.accumulate(cur - ar, axis=1) + ar
        done = la == i
        if done.any():
            res[done] = cur[rows[done], lb[done]]
        prev = cur
    return res


def _featurize_variants(
    tbl: pa.Table, key_col: str, text_col: str, max_dist: int, carry_cols: tuple[str, ...]
) -> pa.Table:
    """One slim row per (input row, deletion variant): int64 variant hash +
    key + string (+ carried columns). Variant generation runs once per
    DICTIONARY-UNIQUE string in the batch (fuzzy-join domains repeat
    heavily), then expands to rows by ``np.repeat`` — the same
    unique-values-only discipline as the dictionary-encoded titles in the
    flagship scorer (stages/score). Null strings are dropped up front —
    SQL semantics (``levenshtein(NULL, x)`` is NULL, never ``<= t``), and a
    null code would otherwise poison the int64 index cast."""
    if tbl[text_col].null_count:
        tbl = tbl.filter(pc.is_valid(tbl[text_col]))
    enc = pc.dictionary_encode(tbl[text_col].combine_chunks())
    uniq = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    var_hashes = [
        np.sort(
            np.fromiter(
                (stable_hash64(v) for v in deletion_variants(s, max_dist)),
                dtype=np.int64,
            )
        )
        for s in uniq
    ]
    n_vars = np.fromiter((len(v) for v in var_hashes), dtype=np.int64, count=len(uniq))
    reps = n_vars[codes]
    row_idx = np.repeat(np.arange(len(codes)), reps)
    vkey = (
        np.concatenate([var_hashes[c] for c in codes])
        if len(codes)
        else np.zeros(0, dtype=np.int64)
    )
    cols = {
        "vkey": pa.array(vkey, type=pa.int64()),
        "__key": tbl[key_col].take(row_idx),
        "__name": tbl[text_col].take(row_idx),
    }
    for c in carry_cols:
        cols[c] = tbl[c].take(row_idx)
    return pa.table(cols)


def fuzzy_self_join(
    ds,
    key_col: str,
    text_col: str,
    max_dist: int = 2,
    carry_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
):
    """All pairs of rows whose ``text_col`` values are within Levenshtein
    distance ``max_dist``, as a Dataset of
    ``(key_a, key_b, name_a, name_b, dist [, <carry>_a, <carry>_b])`` with
    ``key_a < key_b``. ``key_col`` must be unique per row (dedup the value
    domain first — that one groupby is the caller's contract; see module
    docstring for why that is also the scale-correct shape)."""
    feats = ds.map_batches(
        _featurize_variants,
        fn_kwargs={
            "key_col": key_col,
            "text_col": text_col,
            "max_dist": max_dist,
            "carry_cols": tuple(carry_cols),
        },
        batch_format="pyarrow",
    )

    carry = tuple(carry_cols)

    def _pairgen(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["key_a", "key_b", "name_a", "name_b"] + [
            f"{c}_{s}" for c in carry for s in ("a", "b")
        ]
        if pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        pdf = pdf.sort_values(["vkey", "__key"], kind="mergesort")
        vk = pdf["vkey"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], vk[1:] != vk[:-1])))
        ends = np.concatenate((starts[1:], [len(vk)]))
        ia_parts, ib_parts = [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            ia, ib = np.triu_indices(g, k=1)
            ia_parts.append(ia + s)
            ib_parts.append(ib + s)
        if not ia_parts:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        out = {
            "key_a": pdf["__key"].to_numpy()[ia],
            "key_b": pdf["__key"].to_numpy()[ib],
            "name_a": pdf["__name"].to_numpy()[ia],
            "name_b": pdf["__name"].to_numpy()[ib],
        }
        for c in carry:
            out[f"{c}_a"] = pdf[c].to_numpy()[ia]
            out[f"{c}_b"] = pdf[c].to_numpy()[ib]
        res = pd.DataFrame(out)
        # the same pair re-appears once per shared variant — pre-dedup
        # locally before it rides the pair exchange
        return res.drop_duplicates(["key_a", "key_b"], ignore_index=True)

    pairs = partition_map_groups(feats, ["vkey"], _pairgen, num_partitions=num_partitions)

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            pdf = pdf.assign(dist=pd.Series(dtype=np.int64))
            return pdf[
                ["key_a", "key_b", "name_a", "name_b", "dist"]
                + [f"{c}_{s}" for c in carry for s in ("a", "b")]
            ]
        pdf = pdf.drop_duplicates(["key_a", "key_b"], ignore_index=True)
        dist = levenshtein_pairs(pdf["name_a"].tolist(), pdf["name_b"].tolist())
        pdf = pdf.assign(dist=dist)
        pdf = pdf[pdf["dist"] <= max_dist].reset_index(drop=True)
        return pdf[
            ["key_a", "key_b", "name_a", "name_b", "dist"]
            + [f"{c}_{s}" for c in carry for s in ("a", "b")]
        ]

    return partition_map_groups(pairs, ["key_a", "key_b"], _verify, num_partitions=num_partitions)


def fuzzy_join(
    ds_a,
    ds_b,
    key_col: str,
    text_col: str,
    max_dist: int = 2,
    num_partitions: int | None = None,
):
    """Two-corpus edit-distance join: every (row of ``ds_a``, row of
    ``ds_b``) pair whose ``text_col`` values are within Levenshtein distance
    ``max_dist`` — the cross-SOURCE shape of the reference's matchers
    (alpha names × beta names,
    `/root/reference/entity_resolution_engine/matchers/teams_matcher.py`)
    and of incremental dedup (new batch × settled corpus): the two sides
    share one variant exchange but pairs are generated ACROSS sides only,
    so neither corpus is ever re-joined against itself. Output:
    ``(key_a, key_b, name_a, name_b, dist)`` where ``key_a`` comes from
    ``ds_a`` and ``key_b`` from ``ds_b`` (keys unique per row within their
    own side; dist-0 pairs are included — exact cross-source matches)."""

    def _tag(side: int):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column("__side", pa.array([side] * t.num_rows, type=pa.int8()))

        return add

    both = ds_a.map_batches(_tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(_tag(1), batch_format="pyarrow")
    )
    feats = both.map_batches(
        _featurize_variants,
        fn_kwargs={
            "key_col": key_col,
            "text_col": text_col,
            "max_dist": max_dist,
            "carry_cols": ("__side",),
        },
        batch_format="pyarrow",
    )

    def _pairgen(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["key_a", "key_b", "name_a", "name_b"]
        if pdf.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        pdf = pdf.sort_values(["vkey", "__side", "__key"], kind="mergesort")
        vk = pdf["vkey"].to_numpy()
        side = pdf["__side"].to_numpy()
        starts = np.flatnonzero(np.concatenate(([True], vk[1:] != vk[:-1])))
        ends = np.concatenate((starts[1:], [len(vk)]))
        ia_parts, ib_parts = [], []
        for s, e in zip(starts, ends):
            split = s + int(np.searchsorted(side[s:e], 1))
            na, nb = split - s, e - split
            if na == 0 or nb == 0:
                continue
            ia_parts.append(np.repeat(np.arange(s, split), nb))
            ib_parts.append(np.tile(np.arange(split, e), na))
        if not ia_parts:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        res = pd.DataFrame(
            {
                "key_a": pdf["__key"].to_numpy()[ia],
                "key_b": pdf["__key"].to_numpy()[ib],
                "name_a": pdf["__name"].to_numpy()[ia],
                "name_b": pdf["__name"].to_numpy()[ib],
            }
        )
        return res.drop_duplicates(["key_a", "key_b"], ignore_index=True)

    pairs = partition_map_groups(feats, ["vkey"], _pairgen, num_partitions=num_partitions)

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["key_a", "key_b", "name_a", "name_b", "dist"]
        if pdf.empty:
            return pdf.assign(dist=pd.Series(dtype=np.int64))[cols]
        pdf = pdf.drop_duplicates(["key_a", "key_b"], ignore_index=True)
        dist = levenshtein_pairs(pdf["name_a"].tolist(), pdf["name_b"].tolist())
        pdf = pdf.assign(dist=dist)
        return pdf[pdf["dist"] <= max_dist].reset_index(drop=True)[cols]

    return partition_map_groups(pairs, ["key_a", "key_b"], _verify, num_partitions=num_partitions)
