"""CDC merge (stages/cdc): upsert/delete/insert semantics, seq precedence,
bloom false-positive exactness, empty changeset."""

import numpy as np
import pandas as pd

from entity_resolution_engine_ray.stages.cdc import cdc_merge


def _merged(base_rows, change_rows, ray_session=None, **kw):
    import ray.data as rd

    base = rd.from_items(base_rows)
    changes = rd.from_items(change_rows) if change_rows else rd.from_items([])
    out = cdc_merge(base, changes, "k", ["k", "v"], **kw) if change_rows else None
    if not change_rows:
        out = cdc_merge(
            base,
            rd.from_pandas(
                pd.DataFrame(
                    {
                        "k": pd.Series(dtype=np.int64),
                        "op": pd.Series(dtype=str),
                        "seq": pd.Series(dtype=np.int64),
                        "v": pd.Series(dtype=str),
                    }
                )
            ),
            "k",
            ["k", "v"],
            **kw,
        )
    return out.to_pandas().sort_values("k", ignore_index=True)


def test_cdc_merge_semantics(ray_session):
    base = [{"k": i, "v": f"base{i}"} for i in range(10)]
    changes = [
        {"k": 2, "op": "upsert", "seq": 1, "v": "upd2"},
        {"k": 3, "op": "delete", "seq": 1, "v": None},
        # precedence: later seq wins — net delete despite the upsert
        {"k": 4, "op": "upsert", "seq": 1, "v": "upd4"},
        {"k": 4, "op": "delete", "seq": 2, "v": None},
        # reverse precedence: upsert after delete — row survives updated
        {"k": 5, "op": "delete", "seq": 1, "v": None},
        {"k": 5, "op": "upsert", "seq": 2, "v": "resurrect5"},
        # insert (new key)
        {"k": 42, "op": "upsert", "seq": 1, "v": "new42"},
    ]
    out = _merged(base, changes)
    got = dict(zip(out.k, out.v))
    exp = {i: f"base{i}" for i in (0, 1, 6, 7, 8, 9)}
    exp.update({2: "upd2", 5: "resurrect5", 42: "new42"})
    assert got == exp


def test_cdc_merge_empty_changes_is_identity(ray_session):
    base = [{"k": i, "v": f"base{i}"} for i in range(5)]
    out = _merged(base, [])
    assert dict(zip(out.k, out.v)) == {i: f"base{i}" for i in range(5)}


def test_cdc_merge_false_positives_exact(ray_session):
    # fpp≈1: nearly every base row is a bloom "hit", so the cogroup sees
    # almost the whole base — the exact apply must still change nothing
    # but the one real update
    base = [{"k": i, "v": f"base{i}"} for i in range(200)]
    changes = [{"k": 7, "op": "upsert", "seq": 1, "v": "upd7"}]
    out = _merged(base, changes, fpp=0.5)
    assert len(out) == 200
    assert out.loc[out.k == 7, "v"].item() == "upd7"
    assert (out.loc[out.k != 7, "v"] == [f"base{i}" for i in range(200) if i != 7]).all()
