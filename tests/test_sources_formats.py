"""Format-flexible page reads: JSONL/CSV → PAGES_SCHEMA normalization.

The engine's scale path is Parquet (columnar pushdown), but WET-style
extractions commonly ship as JSONL — ``read_pages`` must normalize either
transport to one schema so every downstream stage sees the same shape."""

import numpy as np
import pandas as pd
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


def test_write_sharded_parquet_resume_skips_done_shards(ray_session, tmp_path):
    """Resumable shard export: a second run rewrites ONLY the shard whose
    manifest is missing; sealed shards are pruned map-side and their files
    untouched. Changing params_hash invalidates everything."""
    import os
    import shutil

    import pandas as pd
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import (
        finished_shards,
        read_sharded_parquet,
        write_sharded_parquet,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(100), "shard": [i % 4 for i in range(100)], "v": range(100)}
    )
    out = str(tmp_path / "export")
    r1 = write_sharded_parquet(rd.from_pandas(pdf), out, "shard", params_hash="h1")
    assert r1["written"] == ["0", "1", "2", "3"] and r1["skipped"] == []
    assert finished_shards(out, "h1") == {"0", "1", "2", "3"}

    mtimes = {s: os.path.getmtime(f"{out}/shard={s}/part-0.parquet") for s in "013"}
    shutil.rmtree(f"{out}/shard=2")  # simulate a killed run
    r2 = write_sharded_parquet(rd.from_pandas(pdf), out, "shard", params_hash="h1")
    assert r2["written"] == ["2"] and set(r2["skipped"]) == {"0", "1", "3"}
    for s in "013":  # untouched shards were never rewritten
        assert os.path.getmtime(f"{out}/shard={s}/part-0.parquet") == mtimes[s]

    back = read_sharded_parquet(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["doc_id", "v"]], pdf[["doc_id", "v"]].astype(back[["doc_id", "v"]].dtypes))

    # params change invalidates every shard
    r3 = write_sharded_parquet(rd.from_pandas(pdf), out, "shard", params_hash="h2")
    assert r3["written"] == ["0", "1", "2", "3"]


def test_write_sharded_parquet_rejects_path_escaping_shard_values(ray_session, tmp_path):
    """Shard values become directory names — separators, '..' and empty
    strings must raise, not corrupt the layout or escape out_dir."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import write_sharded_parquet

    out = str(tmp_path / "export")
    for bad in ["../evil", "a/b", "", "..", "a\\b"]:
        pdf = pd.DataFrame({"doc_id": [1], "shard": [bad]})
        with pytest.raises((ValueError, Exception)) as exc_info:
            write_sharded_parquet(rd.from_pandas(pdf), out, "shard")
        assert "invalid shard value" in str(exc_info.value)


def test_read_pages_warc_roundtrip(ray_session, tmp_path):
    """WARC transport (Common-Crawl convention): capture columns round-trip
    byte-identically; text/lang come back NULL (re-extraction downstream is
    the contract) and re-running the canonical extractor over the WARC-read
    html reproduces the original text column byte-for-byte."""
    from entity_resolution_engine_ray.sources.pages import write_pages_warc
    from entity_resolution_engine_ray.stages.extract import extract_text_column

    pages, _truth = generate_pages(60, seed=7)
    out = write_pages_warc(pages, str(tmp_path / "warc"), shard_rows=25)

    ds = read_pages(out, format="warc")
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = pages.to_pandas().sort_values("url").reset_index(drop=True)

    assert list(got.columns) == [f.name for f in PAGES_SCHEMA]
    assert got["url"].tolist() == exp["url"].tolist()
    assert all(a == b for a, b in zip(got["html"], exp["html"]))
    assert (got["warc_ts"].values == exp["warc_ts"].values).all()
    assert got["text"].isna().all() and got["lang"].isna().all()

    # the byte-identical contract: extractor(warc html) == original text
    re_extracted, _title = extract_text_column(
        pa.table({"html": pa.array(list(got["html"]), type=pa.binary())})["html"]
    )
    assert re_extracted.to_pylist() == exp["text"].tolist()


def test_read_pages_warc_skips_malformed_and_non_response(ray_session, tmp_path):
    """One bad record must never kill a crawl-scale read: truncated payloads
    and header-less garbage are dropped-and-counted; warcinfo/request
    records are skipped silently; the good records still come through."""
    import gzip

    p = tmp_path / "warcbad"
    p.mkdir()
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2025-01-01T00:00:05Z\r\n"
        b"WARC-Target-URI: http://ok/\r\nContent-Length: 39\r\n\r\n"
        + b"HTTP/1.1 200 OK\r\n\r\n<html>ok body</html>" + b"\r\n\r\n"
    )
    request = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Date: 2025-01-01T00:00:05Z\r\n"
        b"WARC-Target-URI: http://ok/\r\nContent-Length: 4\r\n\r\nGET " + b"\r\n\r\n"
    )
    no_length = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://bad/\r\n\r\n"
    with open(p / "part-0.warc.gz", "wb") as f:
        f.write(gzip.compress(request) + gzip.compress(no_length) + gzip.compress(good))
    got = read_pages(str(p), format="warc").to_pandas()
    assert got["url"].tolist() == ["http://ok/"]
    assert bytes(got["html"].iloc[0]) == b"<html>ok body</html>"


def test_warc_negative_content_length_cannot_hang():
    """A negative Content-Length must be dropped-and-counted, not move the
    parse cursor backwards (the infinite-loop / bogus-row hazard)."""
    from entity_resolution_engine_ray.sources.pages import _parse_warc_bytes

    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2025-01-01T00:00:05Z\r\n"
        b"WARC-Target-URI: http://neg/\r\nContent-Length: -37\r\n\r\n"
    )
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: 2025-01-01T00:00:05Z\r\n"
        b"WARC-Target-URI: http://ok/\r\nContent-Length: 39\r\n\r\n"
        + b"HTTP/1.1 200 OK\r\n\r\n<html>ok body</html>" + b"\r\n\r\n"
    )
    rows, dropped = _parse_warc_bytes(bad + good)
    assert [r["url"] for r in rows] == ["http://ok/"]
    assert dropped == 1


def test_warc_subsecond_timestamp_roundtrip(ray_session, tmp_path):
    """timestamp[us] precision survives the WARC transport (fractional
    WARC-Date is emitted only when needed; whole seconds stay in the
    Common-Crawl-conventional form)."""
    import pandas as pd

    from entity_resolution_engine_ray.sources.pages import (
        PAGES_SCHEMA,
        write_pages_warc,
    )

    tbl = pa.table(
        {
            "url": ["http://a/", "http://b/"],
            "warc_ts": pa.array(
                [
                    pd.Timestamp("2025-01-01T00:00:00.123456"),
                    pd.Timestamp("2025-01-01T00:00:07"),
                ],
                type=pa.timestamp("us"),
            ),
            "html": pa.array([b"<html>x</html>", b"<html>y</html>"], type=pa.binary()),
            "text": ["x", "y"],
            "lang": ["en", "en"],
        }
    ).cast(PAGES_SCHEMA)
    out = write_pages_warc(tbl, str(tmp_path / "warcus"))
    got = read_pages(out, format="warc").to_pandas().sort_values("url").reset_index(drop=True)
    assert got["warc_ts"].tolist() == [
        pd.Timestamp("2025-01-01T00:00:00.123456"),
        pd.Timestamp("2025-01-01T00:00:07"),
    ]


def test_read_pages_orc_roundtrip_and_prune(ray_session, tmp_path):
    """ORC transport: every column round-trips byte-identically (ORC's
    nanosecond timestamps cast back losslessly to timestamp[us]); column
    pruning is pushed into the per-stripe read."""
    from entity_resolution_engine_ray.sources.pages import write_pages_orc

    pages, _truth = generate_pages(60, seed=11)
    out = write_pages_orc(pages, str(tmp_path / "orc"), shard_rows=25)

    ds = read_pages(out, format="orc")
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == [f.name for f in PAGES_SCHEMA]
    assert got["url"].tolist() == exp["url"].tolist()
    assert all(a == b for a, b in zip(got["html"], exp["html"]))
    assert (got["warc_ts"].values == exp["warc_ts"].values).all()
    assert got["text"].tolist() == exp["text"].tolist()

    pruned = read_pages(out, format="orc", columns=["url", "lang"]).to_pandas()
    assert list(pruned.columns) == ["url", "lang"]
    assert len(pruned) == len(exp)


def test_zone_map_pruning_skips_shards_without_opening_data(ray_session, tmp_path):
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import (
        pruned_shard_paths,
        read_sharded_parquet,
        write_sharded_parquet,
    )

    pdf = pd.DataFrame(
        {
            "shard": ["a"] * 4 + ["b"] * 4 + ["c"] * 4,
            "v": [10, 11, 12, 13, 50, 51, 52, 53, 90, 91, 92, 93],
            "s": list("abcdefghijkl"),
        }
    )
    out = str(tmp_path / "zoned")
    write_sharded_parquet(
        rd.from_pandas(pdf), out, "shard", params_hash="h", zone_cols=["v", "s"]
    )

    # [45, 60] can only live in shard b
    paths, skipped = pruned_shard_paths(out, {"v": (45, 60)})
    assert skipped == ["shard=a", "shard=c"]
    assert all("shard=b" in p for p in paths)
    got = read_sharded_parquet(out, {"v": (45, 60)}).to_pandas()
    assert sorted(got["v"].tolist()) == [50, 51, 52, 53]

    # half-open intervals + string zones
    assert pruned_shard_paths(out, {"v": (None, 20)})[1] == ["shard=b", "shard=c"]
    assert pruned_shard_paths(out, {"v": (80, None)})[1] == ["shard=a", "shard=b"]
    assert pruned_shard_paths(out, {"s": ("e", "f")})[1] == ["shard=a", "shard=c"]

    # a column with no zone map never prunes (safety)
    paths_all, skipped_none = pruned_shard_paths(out, {"nope": (0, 1)})
    assert skipped_none == [] and len(paths_all) == 3

    # everything pruned -> schema preserved, zero rows
    empty = read_sharded_parquet(out, {"v": (1000, 2000)})
    assert empty.count() == 0
    assert set(empty.schema().names) == {"shard", "v", "s"}

    # zone maps only PRUNE: surviving shards still carry out-of-range rows
    loose = read_sharded_parquet(out, {"v": (50, 51)}).to_pandas()
    assert sorted(loose["v"].tolist()) == [50, 51, 52, 53]


def test_bloom_pruning_skips_shards_for_point_lookups(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd

    from entity_resolution_engine_ray.sources.sink import (
        compact_shards,
        pruned_shard_paths,
        read_sharded_parquet,
        write_sharded_parquet,
    )

    # ids hash-scattered over 8 shards: every shard's [min, max] spans the
    # domain, so only the blooms can prune an equality lookup
    ids = np.arange(400, dtype=np.int64)
    pdf = pd.DataFrame({"shard": (ids * 7919) % 8, "doc_id": ids})
    out = str(tmp_path / "bloomed")
    write_sharded_parquet(
        rd.from_pandas(pdf), out, "shard", params_hash="h", bloom_cols=["doc_id"]
    )

    # a single id lives in exactly one shard; at 1% fpp over 7 other
    # shards, expected false-positive shards ≈ 0.07 — require ≥ 5 skipped
    home = int((123 * 7919) % 8)
    paths, skipped = pruned_shard_paths(out, point_filter={"doc_id": [123]})
    assert f"shard={home}" not in skipped  # no false negatives, ever
    assert len(skipped) >= 5
    got = read_sharded_parquet(out, point_filter={"doc_id": [123]}).to_pandas()
    assert 123 in set(got["doc_id"])

    # multi-value lookup unions the probes
    _, sk2 = pruned_shard_paths(out, point_filter={"doc_id": [1, 2, 3]})
    homes = {f"shard={(i * 7919) % 8}" for i in (1, 2, 3)}
    assert not (homes & set(sk2))

    # a column with no bloom never prunes (safety)
    assert pruned_shard_paths(out, point_filter={"nope": [1]})[1] == []

    # an absent id may prune everything — schema survives at 0 rows
    nothing = read_sharded_parquet(out, point_filter={"doc_id": [10**9]})
    assert nothing.count() == 0
    assert set(nothing.schema().names) == {"shard", "doc_id"}

    # compaction recomputes blooms for the merged shards
    compact_shards(out, target_rows=120, params_hash="h", bloom_cols=["doc_id"])
    paths3, sk3 = pruned_shard_paths(out, point_filter={"doc_id": [123]})
    got3 = read_sharded_parquet(out, point_filter={"doc_id": [123]}).to_pandas()
    assert 123 in set(got3["doc_id"])
