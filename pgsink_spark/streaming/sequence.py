"""Transaction sequencing: total order for changelog entries.

The reference wraps each DML message with its owning transaction's
``Begin`` (commit LSN + timestamp) and an intra-transaction sequence
counter, and drops bare Begin/Commit messages
(pkg/subscription/sequence.go:7-52). Downstream total order is
``ORDER BY (lsn, sequence)`` — which is what lets an order-insensitive,
append-only sink recover correctness at read time.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pgsink_spark.streaming.decoder import (
    Begin,
    Commit,
    Delete,
    Insert,
    Relation,
    Truncate,
    Update,
)


@dataclass(frozen=True)
class SequencedMessage:
    message: object  # Insert | Update | Delete | Relation | Truncate
    lsn: int  # owning txn's final/commit LSN
    commit_time: datetime
    xid: int
    sequence: int  # intra-transaction counter, starts at 1


class Sequencer:
    """Stateful Begin-tracking wrapper (one per ordered stream)."""

    def __init__(self):
        self._begin: Begin | None = None
        self._seq = 0

    def feed(self, msg) -> SequencedMessage | None:
        """Sequence one decoded message; returns None for Begin/Commit."""
        if isinstance(msg, Begin):
            self._begin = msg
            self._seq = 0
            return None
        if isinstance(msg, Commit):
            self._begin = None
            return None
        if isinstance(msg, (Insert, Update, Delete, Relation, Truncate)):
            if self._begin is None:
                raise ValueError(
                    f"{type(msg).__name__} outside a transaction (no Begin seen)"
                )
            self._seq += 1
            return SequencedMessage(
                message=msg,
                lsn=self._begin.final_lsn,
                commit_time=self._begin.commit_time,
                xid=self._begin.xid,
                sequence=self._seq,
            )
        return None  # Origin / Type messages carry no row data
