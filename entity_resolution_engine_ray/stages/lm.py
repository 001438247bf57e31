"""Distributed bigram language-model quality scoring (CCNet-style).

The classic training-corpus quality filter (Wenzek et al., "CCNet", 2020)
scores every document with a small language model and keeps the
low-perplexity head. This stage is that operator expressed Ray-Data-first,
with a fixed-size vocabulary so every broadcast stays bounded at 100 TB:

1. **vocab pass** — per-batch token ``value_counts`` partials reduce
   through one ``groupby(term).sum()``; the top-V terms (count DESC, token
   ASC — deterministic) are selected by a DISTRIBUTED sort + ``limit(V)``
   (a web-scale distinct-token set never reaches the driver); all other
   tokens map to ``<unk>``, whose count is total − Σ vocab counts. V caps
   every later structure: the vocab array is O(V), the bigram table
   O(min(corpus bigrams, V²)).
2. **count pass** — the sorted vocab is broadcast once (``ray.put``); each
   batch maps tokens → int ids via ``np.searchsorted`` (vectorized, no
   Python dict per row), forms adjacent within-doc pairs, and emits
   ``np.unique``-compressed bigram-key partials (key = w1·(V+1)+w2, one
   int64) through one ``groupby.sum`` — vocab-bounded, never
   corpus-bounded.
3. **score pass** — the (sorted-key, count) arrays are broadcast once;
   each batch computes add-one-smoothed conditional log-probs
   ``ln((c2+1)/(c1[w1]+V+1))`` with two searchsorted lookups and averages
   per doc with ``np.add.at``. Output is one row per doc with ≥1 bigram.

Scoring a *different* corpus against a trained LM is the same third pass
with the broadcast counts reused — unseen bigrams fall back to the
smoothing floor (count 0).

Reference scope note: the reference engine has no LM scorer; this is one
of the builder-brief training-data operators (text quality scoring),
engineered to the same standards as the SURVEY §2 set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

UNK = "<unk>"


def _explode_tokens(t: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    col = t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
    lists = pc.split_pattern(col, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    row_idx = np.repeat(
        np.arange(len(lists)), pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    )
    mask = flat != ""
    return row_idx[mask], flat[mask]


def build_vocab(
    ds, text_col: str = "text", vocab_size: int = 4096
) -> tuple[np.ndarray, np.ndarray]:
    """Top-``vocab_size`` tokens by (count DESC, token ASC) → (vocab sorted
    lexicographically — the searchsorted key order — and the aligned c1
    unigram-count vector with the ``<unk>`` total appended at index V).

    Scale shape: the per-batch ``value_counts`` partials reduce through one
    ``groupby(term).sum()``; the top-V selection is a DISTRIBUTED sort +
    ``limit(V)`` — only V rows ever reach the driver, so a web-scale
    distinct-token set (billions of typo/url terms) never materializes
    driver-side. The unk count is total tokens minus the vocab's counts
    (one metadata-cheap distributed sum), which also makes a separate
    unigram-counting pass unnecessary."""

    def partial(t: pa.Table) -> pa.Table:
        _, toks = _explode_tokens(t, text_col)
        if len(toks) == 0:
            return pa.table(
                {"term": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
            )
        vc = pd.Series(toks).value_counts()
        return pa.table(
            {"term": pa.array(vc.index.to_numpy()), "n": pa.array(vc.to_numpy(np.int64))}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    ).materialize()  # consumed by the total sum AND the top-V sort
    total = int(counts.sum("n") or 0)
    top = (
        counts.sort(["n", "term"], descending=[True, False]).limit(vocab_size).to_pandas()
    )
    order = np.argsort(top["term"].to_numpy())
    vocab = top["term"].to_numpy()[order]
    cv = top["n"].to_numpy(np.int64)[order]
    return vocab, np.concatenate([cv, [total - cv.sum()]]).astype(np.int64)


def _map_ids(toks: np.ndarray, vocab: np.ndarray) -> np.ndarray:
    """token strings → [0..V] ids (V = unk) via searchsorted on the sorted
    vocab — fully vectorized, no per-row dict lookups."""
    pos = np.searchsorted(vocab, toks)
    pos_c = np.clip(pos, 0, len(vocab) - 1)
    hit = vocab[pos_c] == toks
    return np.where(hit, pos_c, len(vocab)).astype(np.int64)


def train_bigram_counts(ds, vocab: np.ndarray, text_col: str = "text"):
    """→ (bigram sorted keys, bigram counts), key = w1·(V+1)+w2 over mapped
    ids. Partials are ``np.unique``-compressed per batch and reduce through
    one groupby — O(min(corpus bigrams, (V+1)²)) rows, never the corpus.
    Unigram counts come from ``build_vocab`` (same pass as vocab selection),
    so this pass ships bigram keys only."""
    import ray

    V = len(vocab)
    vocab_ref = ray.put(vocab)

    def partial(t: pa.Table) -> pa.Table:
        row_idx, toks = _explode_tokens(t, text_col)
        if len(toks) == 0:
            return pa.table(
                {"key": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
            )
        ids = _map_ids(toks, ray.get(vocab_ref))
        same = row_idx[:-1] == row_idx[1:]
        b_raw = ids[:-1][same] * np.int64(V + 1) + ids[1:][same]
        b_keys, b_cnt = np.unique(b_raw, return_counts=True)
        return pa.table(
            {
                "key": pa.array(b_keys, type=pa.int64()),
                "n": pa.array(b_cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    agg = agg.sort_values("key", kind="mergesort")
    return agg["key"].to_numpy(np.int64), agg["n"].to_numpy(np.int64)


def bigram_lm_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
    lm=None,
):
    """Per-document average bigram log-probability (add-one smoothing over
    the V+1 vocab incl. ``<unk>``). Returns a Dataset (id_col, avg_logp)
    with one row per document that has ≥1 token pair. Higher = more
    in-distribution; a quality gate keeps the top quantile (CCNet keeps
    the low-perplexity head — ppl = exp(-avg_logp)).

    ``lm``: optional pre-trained ``(vocab, c1, bkeys, bcnt)`` tuple so a
    new corpus can be scored against an existing model (the counts pass is
    skipped); default trains on ``ds`` itself."""
    import ray
    import ray.data as rd

    ds = ds.materialize()  # consumed by up to three passes
    if ds.count() == 0:
        # a 0-row input skips lazy map_batches entirely, so the vocab
        # groupby would yield a column-less frame — short-circuit with the
        # typed empty result (same contract as the knn/dedup stages)
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "avg_logp": pa.array([], type=pa.float64()),
                }
            )
        )
    if lm is None:
        vocab, c1 = build_vocab(ds, text_col, vocab_size)
        bkeys, bcnt = train_bigram_counts(ds, vocab, text_col)
    else:
        vocab, c1, bkeys, bcnt = lm
    V = len(vocab)
    refs = ray.put((vocab, c1, bkeys, bcnt))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "avg_logp": pa.array([], type=pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        voc, c1_, bk_, bc_ = ray.get(refs)
        row_idx, toks = _explode_tokens(t, text_col)
        if len(toks) == 0:
            return empty
        ids = _map_ids(toks, voc)
        same = row_idx[:-1] == row_idx[1:]
        w1 = ids[:-1][same]
        keys = w1 * np.int64(V + 1) + ids[1:][same]
        rows = row_idx[:-1][same]
        pos = np.searchsorted(bk_, keys)
        pos_c = np.clip(pos, 0, max(len(bk_) - 1, 0))
        c2 = np.where(
            (len(bk_) > 0) & (bk_[pos_c] == keys), bc_[pos_c], 0
        ).astype(np.float64)
        lp = np.log((c2 + 1.0) / (c1_[w1].astype(np.float64) + V + 1.0))
        doc_ids = t[id_col].to_numpy(zero_copy_only=False)
        sums = np.zeros(t.num_rows, dtype=np.float64)
        cnts = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(sums, rows, lp)
        np.add.at(cnts, rows, 1)
        keep = cnts > 0
        return pa.table(
            {
                id_col: pa.array(doc_ids[keep].astype(np.int64), type=pa.int64()),
                "avg_logp": pa.array(sums[keep] / cnts[keep], type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
