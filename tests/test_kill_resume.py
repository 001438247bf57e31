"""Kill/resume: SIGKILL a pipeline subprocess mid-run, re-run, and verify
the final outputs are byte-identical to an uninterrupted run (BASELINE.md
resumability target)."""

import os
import shutil
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from entity_resolution_engine_ray.pipelines.pages_er import run_pages_er
res = run_pages_er({pages!r}, {out!r})
print("DONE", res["entities"].count(), flush=True)
ray.shutdown()
"""


def _run(pages, out, kill_on_stage: str | None = None) -> bool:
    """Run the pipeline in a subprocess; if ``kill_on_stage`` is given,
    SIGKILL the process the moment that stage's ``_DONE`` manifest appears
    (guaranteed mid-run). Returns True if the run completed."""
    # new session ⇒ the subprocess and every Ray daemon it spawns share a
    # process group we can SIGKILL atomically — a broad pkill of raylet/
    # gcs_server would also take down the test session's own Ray cluster
    proc = subprocess.Popen(
        [sys.executable, "-c", RUNNER.format(repo=REPO, pages=pages, out=out)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    if kill_on_stage is None:
        out_text, _ = proc.communicate(timeout=600)
        return "DONE" in out_text
    marker = os.path.join(out, kill_on_stage, "_DONE")
    deadline = time.time() + 120
    while time.time() < deadline and proc.poll() is None and not os.path.exists(marker):
        time.sleep(0.1)
    if proc.poll() is None:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait()
        time.sleep(2)
        return False
    return True


def _entities(out_dir: str) -> pd.DataFrame:
    return (
        pq.read_table(os.path.join(out_dir, "entities"))
        .to_pandas()
        .sort_values("entity_id")
        .reset_index(drop=True)
    )


@pytest.mark.slow
def test_sigkill_then_resume_is_identical():
    from entity_resolution_engine_ray.sources.pages import write_pages_fixture

    fix = write_pages_fixture("/tmp/er_test_fixture", 500, seed=42)
    clean_out = "/tmp/er_kill_clean"
    kill_out = "/tmp/er_kill_resume"
    shutil.rmtree(clean_out, ignore_errors=True)
    shutil.rmtree(kill_out, ignore_errors=True)

    assert _run(fix["pages"], clean_out)

    # kill the instant the features checkpoint lands (mid-run, pre-edges)
    completed = _run(fix["pages"], kill_out, kill_on_stage="features")
    assert not completed, "kill should fire while the pipeline is mid-run"
    finished_stages = [
        s
        for s in ("features", "edges", "labeled", "entities")
        if os.path.exists(os.path.join(kill_out, s, "_DONE"))
    ]
    assert "entities" not in finished_stages, "kill landed after completion"

    # resume completes and matches the uninterrupted run exactly
    assert _run(fix["pages"], kill_out)
    a = _entities(clean_out)
    b = _entities(kill_out)
    pd.testing.assert_frame_equal(a, b)
