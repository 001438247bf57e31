"""Exact substring (duplicated token-span) detection — stages/substr."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution_engine_ray.stages.substr import (
    cut_dup_spans,
    dup_window_rows,
    substring_dup_counts,
    substring_dup_spans,
    window_hashes,
)


def _serial_dup_positions(docs: dict[int, str], L: int) -> dict[int, list[int]]:
    """Serial oracle: duplicated window start positions per doc, over actual
    token-tuple equality (no hashing)."""
    wins: dict[tuple, list[tuple[int, int]]] = {}
    for doc_id, text in docs.items():
        toks = text.split()
        for i in range(len(toks) - L + 1):
            wins.setdefault(tuple(toks[i : i + L]), []).append((doc_id, i))
    out: dict[int, list[int]] = {d: [] for d in docs}
    for members in wins.values():
        if len(members) >= 2:
            for doc_id, pos in members:
                out[doc_id].append(pos)
    return {d: sorted(ps) for d, ps in out.items()}


def _serial_spans(positions: list[int], L: int) -> list[tuple[int, int]]:
    spans = []
    for p in positions:
        if spans and p <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], p + L))
        else:
            spans.append((p, p + L))
    return spans


DOCS = {
    1: "the quick brown fox jumps over the lazy dog today",
    2: "intro words the quick brown fox jumps over the lazy dog and more trailing text",
    3: "completely unrelated sentence about distributed data processing engines",
    4: "short doc",  # fewer tokens than the window -> no windows at all
    5: "rep rep rep rep rep rep rep rep rep rep rep rep",  # internal repetition
}
L = 5


def _docs_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(DOCS), type=pa.int64()),
                "text": pa.array(list(DOCS.values())),
            }
        )
    )


def test_window_hashes_equal_iff_windows_equal():
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 50, size=200).astype(np.uint64)
    hs = window_hashes(toks, 4)
    assert len(hs) == 197
    wins = [tuple(toks[i : i + 4]) for i in range(197)]
    for i in range(197):
        for j in range(i + 1, 197):
            assert (hs[i] == hs[j]) == (wins[i] == wins[j])


def test_window_hashes_short_doc_empty():
    assert len(window_hashes(np.arange(3, dtype=np.uint64), 5)) == 0
    assert len(window_hashes(np.arange(5, dtype=np.uint64), 5)) == 1


def test_dup_window_rows_matches_serial_oracle(ray_session):
    oracle = _serial_dup_positions(DOCS, L)
    got = dup_window_rows(_docs_ds(), window_tokens=L, num_partitions=3).to_pandas()
    by_doc = {d: sorted(g["pos"]) for d, g in got.groupby("doc_id")}
    for d, ps in oracle.items():
        assert by_doc.get(d, []) == ps, f"doc {d}"


def test_substring_dup_counts_matches_serial_oracle(ray_session):
    oracle = _serial_dup_positions(DOCS, L)
    got = (
        substring_dup_counts(_docs_ds(), window_tokens=L, num_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for d, text in DOCS.items():
        n_win = max(len(text.split()) - L + 1, 0)
        if n_win == 0:
            assert d not in got.index  # sub-window docs don't appear
            continue
        assert got.loc[d, "n_windows"] == n_win
        assert got.loc[d, "n_dup_windows"] == len(oracle[d])


@pytest.mark.parametrize("parts", [2, 7])
def test_substring_dup_counts_partitioning_invariant(ray_session, parts):
    got = (
        substring_dup_counts(_docs_ds(), window_tokens=L, num_partitions=parts)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    base = (
        substring_dup_counts(_docs_ds(), window_tokens=L, num_partitions=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(base)


def test_substring_dup_spans_merge_islands(ray_session):
    oracle = _serial_dup_positions(DOCS, L)
    got = substring_dup_spans(_docs_ds(), window_tokens=L, num_partitions=3).to_pandas()
    by_doc = {
        d: sorted(zip(g["start_tok"], g["end_tok"])) for d, g in got.groupby("doc_id")
    }
    for d, ps in oracle.items():
        assert by_doc.get(d, []) == _serial_spans(ps, L), f"doc {d}"
    # doc 5's twelve 'rep' tokens must merge into ONE maximal span
    assert by_doc[5] == [(0, 12)]


def test_cut_dup_spans_removes_both_copies(ray_session):
    got = (
        cut_dup_spans(_docs_ds(), window_tokens=L, num_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    oracle = _serial_dup_positions(DOCS, L)
    for d, text in DOCS.items():
        toks = text.split()
        keep = [True] * len(toks)
        for s, e in _serial_spans(oracle[d], L):
            for i in range(s, e):
                keep[i] = False
        expect = " ".join(t for t, k in zip(toks, keep) if k)
        assert got.loc[d, "clean_text"] == expect, f"doc {d}"
        assert got.loc[d, "n_cut_tokens"] == keep.count(False)
    # the shared run in docs 1/2 is gone from BOTH, unique flanks survive
    assert "quick brown fox" not in got.loc[1, "clean_text"]
    assert got.loc[2, "clean_text"].startswith("intro words")
    assert got.loc[3, "clean_text"] == DOCS[3]  # untouched doc normalizes to itself
    assert got.loc[5, "clean_text"] == ""  # fully-duplicated doc cut to nothing


def test_sampled_spans_subset_and_catch_long_runs(ray_session):
    # content-defined sampling: sampled dup windows are a SUBSET of the exact
    # ones, and a long shared run is still caught at sample_mod=4
    boiler = " ".join(f"tok{i}" for i in range(60))
    docs = {
        10: boiler + " unique tail ten",
        11: "different head words " + boiler,
        12: "no duplication here at all whatsoever in this row",
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values())),
            }
        )
    )
    exact = dup_window_rows(ds, window_tokens=8, sample_mod=1, num_partitions=3).to_pandas()
    sampled = dup_window_rows(ds, window_tokens=8, sample_mod=4, num_partitions=3).to_pandas()
    exact_set = set(zip(exact["doc_id"], exact["pos"]))
    sampled_set = set(zip(sampled["doc_id"], sampled["pos"]))
    assert sampled_set <= exact_set
    assert {d for d, _ in sampled_set} == {10, 11}  # 53 eligible windows -> hit
