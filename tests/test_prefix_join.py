"""Exact prefix-filter set-similarity join (stages/dedup.prefix_jaccard_self_join).

The operator's exactness claim rests on the prefix-filtering principle; the
property test checks the implemented prefix length directly against the
guarantee (every Jaccard-qualifying pair shares a prefix element), and the
e2e test pins the distributed join against an O(n²) brute force in the same
shingle space.
"""

import itertools
import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_engine_ray.stages.dedup import _prefix_keys_batch

THRESH = 0.7


def _prefix_of(sorted_ids: np.ndarray, t: float) -> np.ndarray:
    tbl = pa.table(
        {
            "id": pa.array([0], type=pa.int64()),
            "token_ids": pa.array([sorted_ids.tolist()], type=pa.list_(pa.int64())),
        }
    )
    out = _prefix_keys_batch(tbl, t)
    return np.asarray(out["band_keys"].to_pylist()[0], dtype=np.int64)


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(0, 30), min_size=1, max_size=25),
    st.sets(st.integers(0, 30), min_size=1, max_size=25),
)
def test_prefix_filter_is_lossless(xa, xb):
    # tiny universe forces heavy overlap — the adversarial regime for a
    # candidate filter
    a = np.array(sorted(xa), dtype=np.int64)
    b = np.array(sorted(xb), dtype=np.int64)
    inter = len(xa & xb)
    union = len(xa | xb)
    if inter / union >= THRESH:
        pa_, pb_ = _prefix_of(a, THRESH), _prefix_of(b, THRESH)
        assert len(np.intersect1d(pa_, pb_)) > 0, (a, b)


def test_prefix_length_formula_batch():
    # n=10, t=0.7: alpha=7, prefix = min(10, 10-7+3) = 6 (margin +2)
    ids = np.arange(10, dtype=np.int64)
    assert len(_prefix_of(ids, 0.7)) == 6
    # empty set emits no keys (and therefore never pairs — matches the
    # exhaustive oracle, where a shingle-less doc has no sh rows)
    assert len(_prefix_of(np.array([], dtype=np.int64), 0.7)) == 0


def test_prefix_join_matches_brute_force(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.dedup import prefix_jaccard_self_join

    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["doc_id", "text"]
    ]
    edges, dropped = prefix_jaccard_self_join(rd.from_pandas(df).repartition(8))
    assert dropped == 0
    got = (
        edges.to_pandas()
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )

    def shset(text):
        toks = re.sub(r"[^\w\s]", " ", text.lower()).split()
        return set(tuple(toks[i : i + 3]) for i in range(len(toks) - 2))

    sets = {r.doc_id: shset(r.text) for r in df.itertuples()}
    ref = []
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        i, u = len(sa & sb), len(sa | sb)
        if u and i / u >= THRESH:
            ref.append((a, b, i / u))
    assert len(got) == len(ref)
    for (l, r, j), row in zip(ref, got.itertuples()):
        assert (l, r) == (row.left_id, row.right_id)
        assert abs(j - row.jaccard) < 1e-12
