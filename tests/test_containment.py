"""Exact containment self-join (stages/containment.containment_self_join).

The asymmetric prefix-filter claim: if C(src→dst) ≥ t, some shared shingle
falls inside src's first n − ceil(t·n) + 3 sorted shingles (the dst side is
indexed in full). The property test checks that directly against random
heavy-overlap sets; the e2e tests pin the distributed join against an O(n²)
brute force in the same shingle space, including a planted pure-subset pair
that Jaccard at the same threshold would MISS (the modality's raison
d'être).
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

THRESH = 0.8


def _prefix_len(n: int, t: float) -> int:
    return min(n, n - int(np.ceil(t * n)) + 3) if n else 0


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(0, 30), min_size=1, max_size=25),
    st.sets(st.integers(0, 30), min_size=1, max_size=25),
)
def test_src_prefix_filter_is_lossless(xa, xb):
    # tiny universe forces heavy overlap — the adversarial regime for a
    # candidate filter
    a = np.array(sorted(xa), dtype=np.int64)
    inter = xa & xb
    if len(inter) / len(xa) >= THRESH:
        prefix = set(a[: _prefix_len(len(a), THRESH)].tolist())
        assert prefix & inter, (sorted(xa), sorted(xb))


def _shingles(text: str, k: int = 3) -> set:
    # mirrors functions/similarity.shingle_hashes: a doc with fewer than k
    # tokens (but at least one) contributes its whole text as ONE shingle
    toks = [t for t in re.sub(r"[^\w\s]", " ", text.lower()).split() if t]
    if 0 < len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute(docs: dict[int, str], t: float) -> set:
    sh = {i: _shingles(s) for i, s in docs.items()}
    out = set()
    for a in sh:
        if not sh[a]:
            continue
        for b in sh:
            if a != b and len(sh[a] & sh[b]) / len(sh[a]) >= t:
                out.add((a, b))
    return out


def test_containment_matches_brute_force(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.containment import containment_self_join

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
    # planted pure subset: doc 100 is a verbatim slice of doc 3 — contained
    # (C = 1.0) but far below Jaccard 0.8 against the longer doc
    docs[3] = " ".join(rng.choice(vocab, size=60))
    docs[100] = " ".join(docs[3].split()[10:18])
    # mutual near-duplicates: both directions must be emitted
    docs[101] = " ".join(vocab[:20])
    docs[102] = " ".join(vocab[:20])

    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": [docs[i] for i in docs]})
    )
    edges, dropped = containment_self_join(ds, threshold=THRESH)
    assert dropped == 0
    got = {(int(r.src_id), int(r.dst_id)) for r in edges.to_pandas().itertuples()}
    want = _brute(docs, THRESH)
    assert got == want
    assert (100, 3) in got and (3, 100) not in got  # asymmetric by design
    assert (101, 102) in got and (102, 101) in got


def test_containment_values_exact(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.containment import containment_self_join

    docs = {1: "a b c d e f g h", 2: "a b c d e f g h x y z w q r s t"}
    # S(1) = 6 shingles, all present in doc 2's prefix ⇒ C(1→2) = 1.0;
    # C(2→1) = 6/14 < 0.8
    ds = rd.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
    edges, dropped = containment_self_join(ds, threshold=0.8)
    assert dropped == 0
    out = edges.to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.src_id, row.dst_id, row.containment) == (1, 2, 1.0)


def test_containment_empty_and_tiny_inputs(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.containment import containment_self_join

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())})
    )
    edges, dropped = containment_self_join(empty)
    assert dropped == 0 and edges.count() == 0
    assert set(edges.schema().names) == {"src_id", "dst_id", "containment"}

    # docs below k tokens collapse to one whole-text shingle (the shared
    # featurizer's short-doc rule): identical 2-token docs mutually contain
    tiny = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]}))
    edges, dropped = containment_self_join(tiny)
    got = {(int(r.src_id), int(r.dst_id)) for r in edges.to_pandas().itertuples()}
    assert dropped == 0 and got == {(1, 2), (2, 1)}

    # zero-token docs have NO shingles at all: no pairs, no crash
    blank = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["", "  "]}))
    edges, dropped = containment_self_join(blank)
    assert dropped == 0 and edges.count() == 0


def test_containment_cap_counts_drops(ray_session):
    import ray.data as rd

    from entity_resolution_engine_ray.stages.containment import containment_self_join

    # 8 identical docs, cap 4: hot shingle groups truncate the dst side and
    # must COUNT every lost candidate instead of silently shrinking recall
    docs = pd.DataFrame({"doc_id": range(8), "text": ["a b c d e f"] * 8})
    edges, dropped = containment_self_join(
        rd.from_pandas(docs), threshold=0.8, max_block_size=4
    )
    assert dropped > 0
    got = {(int(r.src_id), int(r.dst_id)) for r in edges.to_pandas().itertuples()}
    # survivors are real qualifying pairs (subset of the brute-force answer)
    want = _brute({i: "a b c d e f" for i in range(8)}, 0.8)
    assert got <= want and got
