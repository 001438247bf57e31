"""Bigram-LM quality scoring (stages/lm) vs a serial numpy-free oracle."""

import math

import numpy as np
import pyarrow as pa
import pytest

DOCS = [
    (0, "a b a b c"),
    (1, "a b a b a b"),
    (2, "c c q z"),  # q/z fall out of a small vocab -> <unk>
    (3, "b a"),
    (4, "solo"),  # no bigram: must not appear in the output
]


def _serial_lm(docs, vocab_size):
    """Pure-python reference: top-V vocab (count desc, token asc), <unk>
    mapping, add-one smoothing over V+1, per-doc mean of ln conditionals."""
    toks = {d: t.split() for d, t in docs}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for w in ts:
            counts[w] = counts.get(w, 0) + 1
    vocab = set(
        sorted(counts, key=lambda w: (-counts[w], w))[:vocab_size]
    )
    V = len(vocab)
    mapped = {
        d: [w if w in vocab else "<unk>" for w in ts] for d, ts in toks.items()
    }
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for ts in mapped.values():
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    out = {}
    for d, ts in mapped.items():
        lps = [
            math.log((c2[(a, b)] + 1.0) / (c1[a] + V + 1.0))
            for a, b in zip(ts, ts[1:])
        ]
        if lps:
            out[d] = sum(lps) / len(lps)
    return out


def _docs_ds(docs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_matches_serial_oracle():
    from entity_resolution_engine_ray.stages.lm import bigram_lm_logprob

    got = bigram_lm_logprob(_docs_ds(DOCS), vocab_size=3).to_pandas()
    want = _serial_lm(DOCS, vocab_size=3)
    assert set(got["doc_id"]) == set(want)  # doc 4 (no bigram) absent
    for _, row in got.iterrows():
        assert row["avg_logp"] == pytest.approx(want[int(row["doc_id"])], abs=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_partition_invariance():
    from entity_resolution_engine_ray.stages.lm import bigram_lm_logprob

    base = (
        bigram_lm_logprob(_docs_ds(DOCS), vocab_size=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    split = (
        bigram_lm_logprob(_docs_ds(DOCS).repartition(5), vocab_size=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(base["avg_logp"], split["avg_logp"], atol=1e-12)
    assert (base["doc_id"] == split["doc_id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_bigram_lm_pretrained_scores_unseen_corpus():
    """Scoring a NEW corpus against a trained LM: unseen bigrams hit the
    add-one smoothing floor ln(1/(c1+V+1)); unseen tokens map to <unk>."""
    from entity_resolution_engine_ray.stages.lm import (
        bigram_lm_logprob,
        build_vocab,
        train_bigram_counts,
    )

    train = _docs_ds(DOCS).materialize()
    vocab, c1 = build_vocab(train, vocab_size=3)
    bk, bc = train_bigram_counts(train, vocab)
    V = len(vocab)

    new = _docs_ds([(100, "zz yy")])  # both tokens OOV -> (<unk>, <unk>)
    got = bigram_lm_logprob(new, lm=(vocab, c1, bk, bc)).to_pandas()
    unk_id = V
    unk_count = int(c1[unk_id])
    key = unk_id * (V + 1) + unk_id
    seen = int(bc[np.searchsorted(bk, key)]) if key in bk else 0
    want = math.log((seen + 1.0) / (unk_count + V + 1.0))
    assert got["avg_logp"].iloc[0] == pytest.approx(want, abs=1e-12)
