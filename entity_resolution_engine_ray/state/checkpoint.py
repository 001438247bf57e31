"""Per-stage Parquet checkpoints with ``_DONE`` manifests (resume support).

Replaces the reference's destroy-and-restart model (``UESWriter.reset``,
reference ues_writer/writer.py:25-37): each pipeline stage writes its output
Dataset to ``<out_dir>/<stage>/`` atomically (write to a temp sibling dir,
rename, then write ``_DONE``), stamped with a hash of the stage parameters.
A killed job re-run skips every stage whose ``_DONE`` manifest matches and
``read_parquet``s the checkpoint instead — the north rule's "resumes from the
last completed stage".
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import ray.data as rd

DONE_FILE = "_DONE"


class CheckpointStore:
    def __init__(self, out_dir: str, enabled: bool = True):
        self.out_dir = out_dir
        self.enabled = enabled
        if enabled:
            os.makedirs(out_dir, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), DONE_FILE)

    def is_done(self, stage: str, params_hash: str) -> bool:
        if not self.enabled:
            return False
        path = self._manifest_path(stage)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                manifest = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return manifest.get("params_hash") == params_hash

    def read(self, stage: str) -> rd.Dataset:
        return rd.read_parquet(self.stage_dir(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def write(self, ds: rd.Dataset, stage: str, params_hash: str, extra: dict | None = None) -> rd.Dataset:
        """Write ``ds`` as the stage checkpoint; returns a Dataset reading it
        back (so downstream stages consume the materialized checkpoint, not a
        re-execution of the upstream lineage)."""
        final = self.stage_dir(stage)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        ds.write_parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        manifest = {
            "stage": stage,
            "params_hash": params_hash,
            "completed_at": time.time(),
            **(extra or {}),
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f)
        return rd.read_parquet(final)

    def write_table(self, table, stage: str, params_hash: str, extra: dict | None = None) -> None:
        """Small driver-side table checkpoint (metrics, gates)."""
        import pyarrow.parquet as pq

        final = self.stage_dir(stage)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(self._manifest_path(stage), "w") as f:
            json.dump({"stage": stage, "params_hash": params_hash, "completed_at": time.time(), **(extra or {})}, f)
