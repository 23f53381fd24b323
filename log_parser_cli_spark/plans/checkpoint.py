"""Checkpoint manifest — stage-level resumability (T3/T4 semantics).

The reference persists every batch as a chunk file and can replay matching
without re-running discovery (src/runner/chunk-manager.ts:19-34,
semantic-log-parser.ts:108-151). Our unit of resume is the *stage*: each stage
writes its output (parquet; Iceberg-transactional on a real deployment) and
then commits a manifest entry with row counts and wall time. A rerun with
``resume=True`` skips committed stages and reads their outputs — giving the
kill-at-stage-N / rerun / identical-aggregates property that SURVEY.md §5.2
requires.

Entries are committed atomically (tmp file + rename) so a crash mid-write
never yields a corrupt manifest.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str, run_id: str):
        self.out_dir = out_dir
        self.run_id = run_id
        self.path = os.path.join(out_dir, "_manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._state = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
            if state.get("run_id") == self.run_id:
                return state
        return {"run_id": self.run_id, "stages": {}}

    def is_done(self, stage: str) -> bool:
        return stage in self._state["stages"]

    def stage_info(self, stage: str) -> dict | None:
        return self._state["stages"].get(stage)

    def commit(self, stage: str, **info) -> None:
        self._state["stages"][stage] = {"committed_at": time.time(), **info}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._state, f, indent=1)
        os.replace(tmp, self.path)
