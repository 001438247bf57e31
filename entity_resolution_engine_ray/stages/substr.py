"""Exact substring (duplicated token-span) detection — the scalable stand-in
for suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better"): find every run of ``window_tokens``
consecutive whitespace tokens that occurs MORE THAN ONCE in the corpus
(across documents or repeated inside one), so an export pipeline can cut
duplicated boilerplate that document-level near-dup (stages/dedup) misses.

Ray-Data-first shape (no reference analogue; reference has no substring ops):

1. ``map_batches`` featurize: whitespace-tokenize (RE2 split, the IDENTICAL
   pattern string runs in the DuckDB oracle's ``regexp_split_to_array``),
   hash tokens to uint64 (blake2b-64, process-stable), and slide a
   length-``window_tokens`` polynomial rolling hash over them. The rolling
   hash is computed in closed form from prefix sums — h(i) = (P[i+L] - P[i])
   * B^-i with an ODD base B (odd => invertible mod 2^64, and uint64
   wraparound IS mod-2^64 arithmetic) — so every doc is O(n) vectorized
   numpy, no Python inner loop. Emits one slim (win_hash, doc_id, pos) row
   per sampled window: O(corpus tokens / sample rate) int64 rows through the
   shuffle, never strings.
2. ONE hash exchange on ``win_hash``: a window is duplicated iff its hash
   group has >= 2 rows ((doc_id, pos) rows are unique by construction).
3. Per-doc finish: ``substring_dup_counts`` folds (n_windows, n_dup_windows)
   per doc via per-partition partials + one tiny doc_id exchange;
   ``substring_dup_spans`` merges duplicated windows into maximal
   [start_tok, end_tok) spans per doc (gaps-and-islands, vectorized — all
   intervals share length L, so sorted-by-pos islands break exactly where
   pos[i] > pos[i-1] + L).

Scale knob — ``sample_mod`` (content-defined sampling, the CDC/rsync trick):
with sample_mod = s > 1 only windows whose hash satisfies h % s == 0 are
emitted (expected 1/s of them). Because the decision depends on CONTENT, not
position, both copies of a duplicated run sample the SAME windows — a
duplicated token run containing c eligible windows is missed with
probability (1 - 1/s)^c, so long boilerplate runs are caught with high
probability at 1/s of the shuffle volume. sample_mod=1 (default) is exact.

Duplicate equality is hash-exact (64-bit token hashes folded by a 64-bit
polynomial): two DISTINCT windows collide — and are falsely counted
duplicated — with probability ~ n^2 / 2^65; the DuckDB oracle compares
actual window strings, so the driver gate would surface any miscount.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from entity_resolution_engine_ray.functions.similarity import stable_hash64
from entity_resolution_engine_ray.stages.grouping import partition_map_groups

# shared with the DuckDB oracle: regexp_split_to_array(text, TOKEN_SPLIT_PATTERN)
TOKEN_SPLIT_PATTERN = r"[ \t\n\r]+"

_B = np.uint64(0x9E3779B97F4A7C15)  # odd => invertible mod 2^64
_BINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))

# process-global geometric power tables, grown on demand (shared across
# batches; a worker computes powers once per max-doc-length, not per doc)
_POWS = {"B": np.array([1], dtype=np.uint64), "BINV": np.array([1], dtype=np.uint64)}


def _powers(kind: str, n: int) -> np.ndarray:
    cur = _POWS[kind]
    if len(cur) < n:
        base = _B if kind == "B" else _BINV
        grow = max(n, 2 * len(cur))
        ext = np.empty(grow, dtype=np.uint64)
        ext[: len(cur)] = cur
        with np.errstate(over="ignore"):
            for i in range(len(cur), grow):  # amortized: doubles, then cached
                ext[i] = ext[i - 1] * base
        _POWS[kind] = cur = ext
    return cur[:n]


def window_hashes(token_hashes: np.ndarray, window_tokens: int) -> np.ndarray:
    """Rolling polynomial hash of every length-L token window, closed-form
    from prefix sums (all uint64 wraparound arithmetic = mod 2^64):
    P[i] = sum_{j<i} t[j] * B^j;  h(i) = (P[i+L] - P[i]) * BINV^i."""
    n = len(token_hashes)
    L = window_tokens
    if n < L:
        return np.empty(0, dtype=np.uint64)
    t = token_hashes.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        terms = t * _powers("B", n)
        prefix = np.concatenate(([np.uint64(0)], np.cumsum(terms, dtype=np.uint64)))
        return (prefix[L:] - prefix[: n - L + 1]) * _powers("BINV", n - L + 1)


class _WindowFeatures:
    """(id, text) -> one slim (win_hash, doc_id, pos) row per sampled window.
    Per-doc window TOTALS are deliberately not shipped through this shuffle —
    the counts finish recomputes them with one vectorized RE2 count per
    batch, which is cheaper than widening every shuffled row."""

    def __init__(self, id_col: str, text_col: str, window_tokens: int, sample_mod: int):
        self.id_col, self.text_col = id_col, text_col
        self.L, self.mod = window_tokens, sample_mod
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern_regex(
            pc.coalesce(batch[self.text_col], ""), TOKEN_SPLIT_PATTERN
        ).to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cache = self.cache
        hash_col, doc_col, pos_col = [], [], []
        for doc_id, toks in zip(ids, toks_list):
            toks = [t for t in toks if t]  # RE2 split keeps leading/trailing ''
            th = np.empty(len(toks), dtype=np.uint64)
            for i, tok in enumerate(toks):
                h = cache.get(tok)
                if h is None:
                    cache[tok] = h = stable_hash64(tok)
                th[i] = np.uint64(h & 0xFFFFFFFFFFFFFFFF)
            wh = window_hashes(th, self.L)
            if len(wh) == 0:
                continue
            pos = np.arange(len(wh), dtype=np.int64)
            if self.mod > 1:
                keep = (wh % np.uint64(self.mod)) == 0
                wh, pos = wh[keep], pos[keep]
            hash_col.append(wh.view(np.int64))
            doc_col.append(np.full(len(wh), doc_id, dtype=np.int64))
            pos_col.append(pos)
        if len(self.cache) > 2_000_000:
            self.cache.clear()
        if not hash_col:
            return _WINDOW_SCHEMA.empty_table()
        return pa.table(
            {
                "win_hash": pa.array(np.concatenate(hash_col), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(doc_col), type=pa.int64()),
                "pos": pa.array(np.concatenate(pos_col), type=pa.int64()),
            }
        )


_WINDOW_SCHEMA = pa.schema(
    [("win_hash", pa.int64()), ("doc_id", pa.int64()), ("pos", pa.int64())]
)

_WINDOW_FEATURE_STATE: dict[tuple, _WindowFeatures] = {}


def _window_featurize_batch(batch: pa.Table, **kw) -> pa.Table:
    key = tuple(sorted(kw.items()))
    state = _WINDOW_FEATURE_STATE.get(key)
    if state is None:
        state = _WINDOW_FEATURE_STATE[key] = _WindowFeatures(**kw)
    return state(batch)


def _mark_dups(tbl: pa.Table) -> pa.Table:
    """One win_hash partition: keep rows whose hash group has >= 2 members."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()), "pos": pa.array([], type=pa.int64())})
    h = tbl["win_hash"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    new = np.r_[True, hs[1:] != hs[:-1]]
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    dup_sel = order[sizes[gid] >= 2]
    return pa.table(
        {
            "doc_id": tbl["doc_id"].take(pa.array(dup_sel, type=pa.int64())),
            "pos": tbl["pos"].take(pa.array(dup_sel, type=pa.int64())),
        }
    )


def dup_window_rows(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    sample_mod: int = 1,
    num_partitions: int | None = None,
):
    """(id, text) -> Dataset of duplicated (doc_id, pos) windows (pos =
    0-based token index of the window start; every returned window's
    token span [pos, pos + window_tokens) occurs >= 2 times in the corpus)."""
    rows = ds.map_batches(
        _window_featurize_batch,
        fn_kwargs={
            "id_col": id_col,
            "text_col": text_col,
            "window_tokens": window_tokens,
            "sample_mod": sample_mod,
        },
        batch_format="pyarrow",
        batch_size=512,
    )
    return partition_map_groups(rows, ["win_hash"], _mark_dups, num_partitions, arrow_fns=True)


def substring_dup_counts(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    num_partitions: int | None = None,
):
    """(id, text) -> (doc_id, n_windows, n_dup_windows) for every doc with at
    least one full window (>= window_tokens tokens). Exact (sample_mod=1).

    n_windows is recomputed in the counts pass (one vectorized RE2 count per
    batch — cheaper than shipping marker rows through the win_hash shuffle);
    n_dup_windows folds from the duplicated-window rows via per-partition
    partials + one tiny doc_id exchange."""
    dup_rows = dup_window_rows(
        ds, id_col, text_col, window_tokens=window_tokens, sample_mod=1,
        num_partitions=num_partitions,
    )

    def dup_partials(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_dup_windows": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    dup_partial_ds = dup_rows.map_batches(dup_partials, batch_format="pyarrow")

    def totals(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(
                pc.coalesce(t[text_col], ""), r"[^ \t\n\r]+"
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        n_win = n_tok - window_tokens + 1
        keep = n_win >= 1
        return pa.table(
            {
                "doc_id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False)[keep], type=pa.int64()
                ),
                "n_windows": pa.array(n_win[keep], type=pa.int64()),
                "n_dup_windows": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
            }
        )

    totals_ds = ds.map_batches(totals, batch_format="pyarrow")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_windows": pd.Series([], dtype=np.int64),
                    "n_dup_windows": pd.Series([], dtype=np.int64),
                }
            )
        g = pdf.groupby("doc_id", as_index=False).agg(
            n_windows=("n_windows", "sum"), n_dup_windows=("n_dup_windows", "sum")
        )
        return g.astype({"n_windows": np.int64, "n_dup_windows": np.int64})

    tagged = totals_ds.union(
        dup_partial_ds.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_windows": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                    "n_dup_windows": t["n_dup_windows"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    fold_parts = None if num_partitions is None else max(4, num_partitions // 4)
    return partition_map_groups(tagged, ["doc_id"], fold, fold_parts)


def substring_dup_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    sample_mod: int = 1,
    num_partitions: int | None = None,
):
    """(id, text) -> maximal duplicated token spans (doc_id, start_tok,
    end_tok) — the cut list a substring-dedup export applies. Overlapping /
    adjacent duplicated windows merge (gaps-and-islands): all intervals are
    length ``window_tokens``, so after the per-doc pos sort an island breaks
    exactly where pos[i] > pos[i-1] + window_tokens."""
    dup_rows = dup_window_rows(
        ds, id_col, text_col, window_tokens=window_tokens, sample_mod=sample_mod,
        num_partitions=num_partitions,
    )
    L = window_tokens

    def spans(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "start_tok": pa.array([], type=pa.int64()),
                "end_tok": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        p = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        brk = np.r_[True, (d[1:] != d[:-1]) | (p[1:] > p[:-1] + L)]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(p)] - 1
        return pa.table(
            {
                "doc_id": pa.array(d[starts], type=pa.int64()),
                "start_tok": pa.array(p[starts], type=pa.int64()),
                "end_tok": pa.array(p[ends] + L, type=pa.int64()),
            }
        )

    return partition_map_groups(dup_rows, ["doc_id"], spans, num_partitions, arrow_fns=True)


def cut_dup_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 8,
    sample_mod: int = 1,
    num_partitions: int | None = None,
):
    """The substring-dedup EXPORT: (id, text) -> (doc_id, clean_text,
    n_cut_tokens) with every duplicated span's tokens removed from every
    occurrence and the survivors re-joined with single spaces (i.e. output
    text is whitespace-normalized; a doc with no duplicated spans comes back
    as its normalized self). Docs with zero tokens are dropped.

    One doc_id cogroup of the span list against the corpus; the span side is
    tiny (merged islands, not windows), the text never re-shuffles beyond
    this single co-partitioned exchange."""

    def doc_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "text": pc.cast(pc.coalesce(t[text_col], ""), pa.string()),
                "start_tok": pa.array(np.full(n, -1, dtype=np.int64)),
                "end_tok": pa.array(np.full(n, -1, dtype=np.int64)),
            }
        )

    def span_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": pa.array([None] * t.num_rows, type=pa.string()),
                "start_tok": t["start_tok"],
                "end_tok": t["end_tok"],
            }
        )

    spans_ds = substring_dup_spans(
        ds, id_col, text_col, window_tokens=window_tokens, sample_mod=sample_mod,
        num_partitions=num_partitions,
    )
    tagged = ds.map_batches(doc_side, batch_format="pyarrow").union(
        spans_ds.map_batches(span_side, batch_format="pyarrow")
    )

    def rebuild(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "clean_text": pa.array([], type=pa.string()),
                "n_cut_tokens": pa.array([], type=pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        is_doc = pc.is_valid(tbl["text"]).to_numpy(zero_copy_only=False)
        span_d = tbl["doc_id"].to_numpy(zero_copy_only=False)[~is_doc]
        span_s = tbl["start_tok"].to_numpy(zero_copy_only=False)[~is_doc]
        span_e = tbl["end_tok"].to_numpy(zero_copy_only=False)[~is_doc]
        cuts: dict[int, list[tuple[int, int]]] = {}
        for d, s, e in zip(span_d, span_s, span_e):
            cuts.setdefault(int(d), []).append((int(s), int(e)))
        doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)[is_doc]
        texts = tbl["text"].filter(pa.array(is_doc)).to_pylist()
        out_id, out_text, out_cut = [], [], []
        split = re.compile(TOKEN_SPLIT_PATTERN).split  # NOT str.split: must
        # tokenize with the exact RE2 class the window featurizer (and the
        # SQL oracle) uses — str.split also breaks on \v/\f/unicode spaces
        for d, text in zip(doc_ids, texts):
            toks = [t for t in split(text) if t]
            if not toks:
                continue
            spans = cuts.get(int(d))
            if spans:
                keep = np.ones(len(toks), dtype=bool)
                for s, e in spans:
                    keep[s:e] = False
                kept = [t for t, k in zip(toks, keep) if k]
                out_cut.append(len(toks) - len(kept))
                toks = kept
            else:
                out_cut.append(0)
            out_id.append(int(d))
            out_text.append(" ".join(toks))
        if not out_id:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "clean_text": pa.array(out_text, type=pa.string()),
                "n_cut_tokens": pa.array(out_cut, type=pa.int64()),
            }
        )

    return partition_map_groups(tagged, ["doc_id"], rebuild, num_partitions, arrow_fns=True)
