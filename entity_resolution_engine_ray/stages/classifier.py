"""Distributed linear quality classifier (fastText-style) over documents.

Model-based quality filtering is the third leg of corpus curation next to
heuristic rules and LM perplexity (e.g. the classifier-filtered corpora of
GPT-3 / FineWeb-Edu lineage): train a linear classifier on hashed
bag-of-ngram features against a seed label, then score every document and
keep the high-probability head. Expressed Ray-Data-first:

- **features** — tokens + adjacent bigrams hashed into D buckets with the
  deterministic ``pd.util.hash_array`` (seeded key), binary presence per
  doc (deduped (row, feat) pairs). Per-batch CSR-style construction, fully
  vectorized; D bounds every model structure, the vocabulary is never
  materialized.
- **training** — full-batch logistic regression via gradient descent.
  Each step broadcasts w (``ray.put``), every batch emits its SPARSE
  gradient contribution as (dim, grad) rows compressed with ``np.unique``;
  one ``groupby(dim).sum()`` reduces them to ≤D rows on the driver. Step
  traffic is O(touched dims), independent of corpus size; steps are
  deterministic up to float summation order.
- **scoring** — one vectorized map pass with the final w broadcast.

No SQL oracle (iterative float training isn't SQL-expressible); the unit
tests pin serial-numpy parity, loss decrease, heldout accuracy, and
partition invariance. Scope note: this is a builder-brief training-data
operator (quality scoring), not a reference-engine surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

_HASH_KEY = "b5f3c1a7d9e80246"  # deterministic pd.util.hash_array seed


def _featurize(
    t: pa.Table, text_col: str, dim: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """batch → CSR-ish (row_idx, feat_idx, 1.0) binary presence triplets.
    Unigrams + within-doc adjacent bigrams, hashed into [0, dim)."""
    from entity_resolution_engine_ray.stages.lm import _explode_tokens

    row_idx, toks = _explode_tokens(t, text_col)
    if len(toks) == 0:
        return (np.empty(0, np.int64),) * 3
    h_uni = pd.util.hash_array(toks, hash_key=_HASH_KEY)
    same = row_idx[:-1] == row_idx[1:]
    # bigram hash: mix the two token hashes order-sensitively (splitmix-ish)
    h_big = (h_uni[:-1][same] * np.uint64(0x9E3779B97F4A7C15)) ^ h_uni[1:][same]
    rows = np.concatenate([row_idx, row_idx[:-1][same]])
    feats = (np.concatenate([h_uni, h_big]) % np.uint64(dim)).astype(np.int64)
    # binary presence features (deduped (row, feat) pairs): a discriminative
    # token contributes a full w[f] to the margin regardless of doc length —
    # tf/l1 weighting shrinks rare-token signal by 1/len and conditions the
    # problem badly for full-batch GD
    key = rows.astype(np.int64) * np.int64(dim) + feats
    uniq = np.unique(key)
    rows = (uniq // dim).astype(np.int64)
    feats = (uniq % dim).astype(np.int64)
    return rows, feats, np.ones(len(uniq), dtype=np.float64)


def train_logreg(
    ds,
    label_col: str,
    text_col: str = "text",
    dim: int = 1024,
    n_iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    local_train_row_threshold: int = 50_000,
):
    """Full-batch logistic regression over a Dataset → (w, bias, losses).

    Size-gated two-path trainer (same updates, bit-comparable up to float
    summation order):

    - seed set ≤ ``local_train_row_threshold`` rows (the normal case —
      curated quality seed sets are small): collect ONCE and iterate
      locally; paying a distributed pass + groupby per GD step for a
      100-row seed is pure scheduler overhead.
    - larger: per step one map_batches pass emits sparse (dim, grad)
      partials plus scalar (loss, count, bias-grad) rows; one small
      groupby folds them. The corpus is never collected; w (D floats) is
      the only broadcast. This is the 100-TB path (step traffic O(D),
      independent of corpus size)."""
    import ray

    ds = ds.materialize()  # consumed once per GD step (or once to collect)
    n = ds.count()
    if n == 0:
        raise ValueError("cannot train on an empty dataset")
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses: list[float] = []

    if n <= local_train_row_threshold:
        t = pa.concat_tables(ray.get(ds.to_arrow_refs()))
        rows, feats, vals = _featurize(t, text_col, dim)
        y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
        for _ in range(n_iters):
            margin = np.zeros(n, dtype=np.float64)
            np.add.at(margin, rows, vals * w[feats])
            margin += b
            p = 1.0 / (1.0 + np.exp(-margin))
            eps = 1e-12
            losses.append(
                float(-np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)))
                + 0.5 * l2 * float(w @ w)
            )
            err = p - y
            grad = np.zeros(dim, dtype=np.float64)
            np.add.at(grad, feats, vals * err[rows])
            w = w - lr * (grad / n + l2 * w)
            b = b - lr * float(err.sum()) / n
        return w, b, losses

    for _ in range(n_iters):
        w_ref = ray.put((w, b))

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "d": pa.array([], type=pa.int64()),
                    "g": pa.array([], type=pa.float64()),
                }
            )
            if t.num_rows == 0:
                return empty
            w_, b_ = ray.get(w_ref)
            rows, feats, vals = _featurize(t, text_col, dim)
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            margin = np.zeros(t.num_rows, dtype=np.float64)
            np.add.at(margin, rows, vals * w_[feats])
            margin += b_
            p = 1.0 / (1.0 + np.exp(-margin))
            # clipped log-loss sum + per-dim sparse gradient
            eps = 1e-12
            loss = -np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
            err = p - y  # (n,)
            g_sparse = vals * err[rows]
            keys, inv = np.unique(feats, return_inverse=True)
            g = np.zeros(len(keys), dtype=np.float64)
            np.add.at(g, inv, g_sparse)
            # scalar partials ride along as negative dims (-1 loss, -2 bias,
            # -3 count) — one shuffle for everything
            return pa.table(
                {
                    "d": pa.array(
                        np.concatenate([keys, [-1, -2, -3]]), type=pa.int64()
                    ),
                    "g": pa.array(
                        np.concatenate([g, [loss, float(err.sum()), float(t.num_rows)]]),
                        type=pa.float64(),
                    ),
                }
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("d")
            .aggregate(Sum("g", alias_name="g"))
        ).to_pandas()
        dcol = agg["d"].to_numpy(np.int64)
        gcol = agg["g"].to_numpy(np.float64)
        loss = float(gcol[dcol == -1][0])
        bias_g = float(gcol[dcol == -2][0])
        n_total = float(gcol[dcol == -3][0])
        mask = dcol >= 0
        grad = np.zeros(dim, dtype=np.float64)
        grad[dcol[mask]] = gcol[mask]
        losses.append(loss / n_total + 0.5 * l2 * float(w @ w))
        w = w - lr * (grad / n_total + l2 * w)
        b = b - lr * (bias_g / n_total)
    return w, b, losses


def score_logreg(ds, w: np.ndarray, b: float, id_col: str = "doc_id", text_col: str = "text"):
    """One vectorized scoring pass: Dataset (id_col, prob)."""
    import ray

    dim = len(w)
    w_ref = ray.put((w, b))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "prob": pa.array([], type=pa.float64()),
                }
            )
        w_, b_ = ray.get(w_ref)
        rows, feats, vals = _featurize(t, text_col, dim)
        margin = np.zeros(t.num_rows, dtype=np.float64)
        np.add.at(margin, rows, vals * w_[feats])
        margin += b_
        return pa.table(
            {
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
                "prob": pa.array(1.0 / (1.0 + np.exp(-margin)), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
