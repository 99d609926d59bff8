"""Sync-state persistence (SURVEY.md §2.8): the watermark table.

The reference keeps a small last-applied-version row per synced table; here
it is a JSON checkpoint on the driver (the streaming path uses Spark
checkpoints instead — streaming/jobs.py). Unit-tested; not a data query, so
not a declared qid.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass
from datetime import datetime, timezone


@dataclass
class SyncState:
    table: str
    last_version: int
    synced_at: str = ""

    def stamped(self) -> "SyncState":
        return SyncState(self.table, self.last_version, datetime.now(timezone.utc).isoformat())


class StateStore:
    """Atomic JSON checkpoint of per-table sync versions."""

    def __init__(self, path: str):
        self.path = path

    def _read_all(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, table: str) -> SyncState | None:
        row = self._read_all().get(table)
        return SyncState(**row) if row else None

    def put(self, state: SyncState) -> None:
        data = self._read_all()
        data[state.table] = asdict(state.stamped())
        # atomic replace so a crashed sync never half-writes the watermark
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, self.path)
