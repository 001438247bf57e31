"""Distributed logistic-regression quality classifier (stages/classifier)."""

import numpy as np
import pyarrow as pa
import pytest

RNG_WORDS_GOOD = ["clean", "prose", "article", "report", "study", "analysis"]
RNG_WORDS_BAD = ["zzz", "spam", "click", "wingz", "xxx", "lotto"]


def _corpus(n=120, seed=7):
    rng = np.random.default_rng(seed)
    ids, texts, labels = [], [], []
    for i in range(n):
        good = i % 2 == 0
        words = RNG_WORDS_GOOD if good else RNG_WORDS_BAD
        # 10% crossover noise so the problem isn't perfectly separable
        toks = [
            words[rng.integers(len(words))]
            if rng.random() > 0.1
            else (RNG_WORDS_BAD + RNG_WORDS_GOOD)[rng.integers(12)]
            for _ in range(rng.integers(20, 40))
        ]
        ids.append(i)
        texts.append(" ".join(toks))
        labels.append(1 if good else 0)
    return ids, texts, labels


def _ds(ids, texts, labels):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts),
                "label": pa.array(labels, type=pa.int64()),
            }
        )
    )


def _serial_train(texts, labels, dim, n_iters, lr, l2):
    """Single-process reference: same featurizer, same GD updates."""
    from entity_resolution_engine_ray.stages.classifier import _featurize

    t = pa.table({"text": pa.array(texts)})
    rows, feats, vals = _featurize(t, "text", dim)
    y = np.asarray(labels, dtype=np.float64)
    n = len(texts)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(n_iters):
        margin = np.zeros(n)
        np.add.at(margin, rows, vals * w[feats])
        margin += b
        p = 1.0 / (1.0 + np.exp(-margin))
        err = p - y
        grad = np.zeros(dim)
        np.add.at(grad, feats, vals * err[rows])
        w = w - lr * (grad / n + l2 * w)
        b = b - lr * float(err.sum()) / n
    return w, b


@pytest.mark.usefixtures("ray_session")
def test_logreg_matches_serial_and_learns():
    from entity_resolution_engine_ray.stages.classifier import score_logreg, train_logreg

    ids, texts, labels = _corpus()
    ds = _ds(ids, texts, labels)
    # force the distributed path (the local gate would absorb 120 rows)
    w, b, losses = train_logreg(
        ds, "label", dim=256, n_iters=30, lr=2.0, l2=1e-4, local_train_row_threshold=0
    )
    # learning happened
    assert losses[-1] < 0.5 * losses[0]
    # parity with the serial reference (same featurizer + updates; only
    # float summation order differs)
    ws, bs = _serial_train(texts, labels, dim=256, n_iters=30, lr=2.0, l2=1e-4)
    assert np.allclose(w, ws, atol=1e-8)
    assert b == pytest.approx(bs, abs=1e-8)
    # the small-seed LOCAL path lands on the same model
    wl, bl, _ = train_logreg(ds, "label", dim=256, n_iters=30, lr=2.0, l2=1e-4)
    assert np.allclose(w, wl, atol=1e-8)
    assert b == pytest.approx(bl, abs=1e-8)
    # training accuracy on a 10%-noise two-distribution problem
    probs = score_logreg(ds, w, b).to_pandas().sort_values("doc_id")
    pred = (probs["prob"].to_numpy() >= 0.5).astype(int)
    acc = (pred == np.asarray(labels)).mean()
    assert acc >= 0.9


@pytest.mark.usefixtures("ray_session")
def test_logreg_partition_invariance():
    from entity_resolution_engine_ray.stages.classifier import train_logreg

    ids, texts, labels = _corpus(n=60)
    w1, b1, _ = train_logreg(
        _ds(ids, texts, labels), "label", dim=128, n_iters=5, local_train_row_threshold=0
    )
    w2, b2, _ = train_logreg(
        _ds(ids, texts, labels).repartition(7),
        "label",
        dim=128,
        n_iters=5,
        local_train_row_threshold=0,
    )
    assert np.allclose(w1, w2, atol=1e-9)
    assert b1 == pytest.approx(b2, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_logreg_empty_raises():
    from entity_resolution_engine_ray.stages.classifier import train_logreg

    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "label": pa.array([], type=pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError):
        train_logreg(empty, "label", dim=64, n_iters=1)
