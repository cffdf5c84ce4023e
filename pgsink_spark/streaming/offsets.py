"""Confirmed-LSN offset store: the ack watermark contract.

Reference: ``Confirm(pos)`` records the highest fully-flushed LSN and
panics on regression (pkg/subscription/stream.go:47-55); the heartbeat
loop reports it to Postgres, releasing WAL. After a restart the slot
replays everything past the confirmed LSN — at-least-once, never lost.

Spark mapping: this is exactly a streaming checkpoint's committed
offset. The store keeps the same monotonicity contract and a
``replay_from`` filter the source uses on restart.
"""

from __future__ import annotations

import json
import os
import tempfile


class OffsetStore:
    """Monotonic confirmed-LSN persistence (one slot)."""

    def __init__(self, path: str):
        self.path = path
        self._confirmed: int | None = None
        if os.path.exists(path):
            with open(path) as f:
                self._confirmed = json.load(f)["confirmed_lsn"]

    @property
    def confirmed_lsn(self) -> int | None:
        return self._confirmed

    def confirm(self, lsn: int) -> None:
        if self._confirmed is not None and lsn < self._confirmed:
            raise ValueError(
                f"confirmed LSN regression: {lsn} < {self._confirmed}"
            )
        self._confirmed = lsn
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump({"confirmed_lsn": lsn}, f)
        os.replace(tmp, self.path)

    def should_replay(self, lsn: int) -> bool:
        """Source-side filter on restart: deliver only past the watermark."""
        return self._confirmed is None or lsn > self._confirmed
