"""Bloom-filter semi-join prefilter: no false negatives, bounded false
positives, distributed build == serial build, and join results unchanged."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from entity_resolution_engine_ray.stages.bloom import (
    BloomFilter,
    bloom_prefilter,
    build_bloom,
)


def test_bloom_no_false_negatives_and_bounded_fpp():
    rng = np.random.default_rng(3)
    present = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    bf = BloomFilter(len(present), fpp=0.01)
    bf.add(present)
    assert bf.contains(present).all()  # zero false negatives, by construction

    absent = (rng.choice(10_000_000, size=20000, replace=False) + 10_000_000).astype(np.int64)
    fp_rate = bf.contains(absent).mean()
    assert fp_rate < 0.03, fp_rate  # ~1% target with headroom


def test_bloom_merge_is_union():
    a_keys = np.arange(0, 1000, dtype=np.int64)
    b_keys = np.arange(500, 1500, dtype=np.int64)
    a = BloomFilter(2000, 0.01)
    a.add(a_keys)
    b = BloomFilter(2000, 0.01)
    b.add(b_keys)
    a.merge(b)
    assert a.contains(np.arange(0, 1500, dtype=np.int64)).all()


def test_distributed_build_matches_serial_and_join_unchanged(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    small_keys = rng.choice(1_000_000, size=2000, replace=False).astype(np.int64)
    big = pd.DataFrame(
        {
            "k": rng.integers(0, 1_000_000, size=50_000).astype(np.int64),
            "v": rng.normal(size=50_000),
        }
    )

    small_ds = rd.from_arrow(pa.table({"k": pa.array(small_keys)})).repartition(5)
    bf = build_bloom(small_ds, "k", n_expected=len(small_keys), fpp=0.01)

    serial = BloomFilter(len(small_keys), 0.01)
    serial.add(small_keys)
    assert (bf.bits == serial.bits).all()  # distributed OR-merge == serial build

    big_ds = rd.from_arrow(pa.Table.from_pandas(big, preserve_index=False)).repartition(8)
    surviving = bloom_prefilter(big_ds, bf, "k").to_pandas()

    keyset = set(small_keys.tolist())
    exact = big[big["k"].isin(keyset)]
    # prefilter is a superset of the exact semi-join…
    assert set(exact.index if False else map(tuple, exact[["k"]].values)) <= set(
        map(tuple, surviving[["k"]].values)
    )
    # …and the exact join over survivors equals the exact join over everything
    refined = surviving[surviving["k"].isin(keyset)]
    assert len(refined) == len(exact)
    assert refined["v"].sum() == pytest.approx(exact["v"].sum())
    # and it actually pruned the shuffle meaningfully (most rows don't match)
    assert len(surviving) < 0.1 * len(big)
