"""Format-flexible page reads: JSONL/CSV → PAGES_SCHEMA normalization.

The engine's scale path is Parquet (columnar pushdown), but WET-style
extractions commonly ship as JSONL — ``read_pages`` must normalize either
transport to one schema so every downstream stage sees the same shape."""

import numpy as np
import pyarrow as pa
import pytest

from entity_resolution_engine_ray.sources.pages import (
    PAGES_SCHEMA,
    generate_pages,
    read_pages,
    write_pages_jsonl,
)


def test_read_pages_jsonl_roundtrip(ray_session, tmp_path):
    pages, _truth = generate_pages(60, seed=7)
    out = write_pages_jsonl(pages, str(tmp_path / "jsonl"), shard_rows=25)

    ds = read_pages(out, format="jsonl")
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = pages.to_pandas().sort_values("url").reset_index(drop=True)

    assert pa.Table.from_pandas(got, preserve_index=False).schema.equals(
        pa.Table.from_pandas(exp, preserve_index=False).schema
    )
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()  # byte-identical contract column
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert all(a == b for a, b in zip(got["html"], exp["html"]))  # base64 round-trip
    # fixture timestamps are whole seconds → ISO-8601 transport is lossless
    assert (got["warc_ts"].values == exp["warc_ts"].values).all()


def test_read_pages_jsonl_column_prune_and_missing(ray_session, tmp_path):
    import json as _json

    pages, _ = generate_pages(10, seed=3)
    out = write_pages_jsonl(pages, str(tmp_path / "j2"))
    ds = read_pages(out, format="jsonl", columns=["url", "lang"])
    assert set(ds.to_pandas().columns) == {"url", "lang"}

    # missing columns surface as typed nulls, not a crash
    p = tmp_path / "j3"
    p.mkdir()
    with open(p / "part-0.jsonl", "w") as f:
        f.write(_json.dumps({"url": "http://a/", "text": "hello world"}) + "\n")
    got = read_pages(str(p), format="jsonl").to_pandas()
    assert got["lang"].isna().all() and got["warc_ts"].isna().all()
    assert got["url"].iloc[0] == "http://a/"


def test_read_pages_unknown_format():
    with pytest.raises(ValueError):
        read_pages("/nonexistent", format="avro")


def test_read_pages_csv(ray_session, tmp_path):
    """CSV transport: text columns + epoch-us integer timestamps normalize
    to the same schema (html absent → typed nulls)."""
    import csv

    p = tmp_path / "csv"
    p.mkdir()
    base_us = 1_735_689_600_000_000
    with open(p / "part-0.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "warc_ts", "text", "lang"])
        for i in range(5):
            w.writerow([f"http://x{i}/", base_us + i * 1_000_000, f"doc {i}", "en"])
    got = read_pages(str(p), format="csv").to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == [f.name for f in PAGES_SCHEMA]
    assert (got["warc_ts"].iloc[1] - got["warc_ts"].iloc[0]).total_seconds() == 1.0
    assert got["html"].isna().all()
    assert np.issubdtype(got["warc_ts"].dtype, np.datetime64)
