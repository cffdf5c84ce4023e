"""Subscription: the CDC receive loop, minus the socket.

Ties decode → sequence → marshal → offset filtering into one consumer
the way the reference's subscription does over a replication connection
(pkg/subscription/subscription.go:80-111, stream.go:78-232). The wire
transport is pluggable: anything yielding ``(wal_lsn, bytes)`` pairs —
a recorded WAL capture, a test harness, or a live pgoutput socket
client — feeds the same pipeline.

Delivery contract (proved by the reference's subscription tests,
pkg/subscription/subscription_test.go:205-262, kept here):
- messages from transactions at or below the confirmed LSN are NOT
  redelivered after restart;
- unconfirmed transactions replay in full (at-least-once);
- tables without a registered Relation never reach the changelog.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pgsink_spark.streaming.decoder import decode_message
from pgsink_spark.streaming.marshal import Modification, RelationCache, marshal
from pgsink_spark.streaming.offsets import OffsetStore
from pgsink_spark.streaming.sequence import Sequencer


class Subscription:
    """Replayable pgoutput consumer with confirmed-LSN filtering."""

    def __init__(self, offsets: OffsetStore):
        self.offsets = offsets
        self.cache = RelationCache()

    def stream(self, wire: Iterable[bytes]) -> Iterator[Modification]:
        """Decode a wire stream into modifications past the watermark.

        Relations always register (schema state must be rebuilt on
        replay); row messages below the confirmed LSN are dropped —
        the slot-replay semantics of ``START_REPLICATION`` at
        ``confirmed_flush_lsn``.
        """
        seq = Sequencer()
        for buf in wire:
            sm = seq.feed(decode_message(buf))
            if sm is None:
                continue
            mod = marshal(self.cache, sm)
            if mod is None:
                continue
            if not self.offsets.should_replay(mod.lsn):
                continue
            yield mod

    def confirm(self, lsn: int) -> None:
        """Ack fully-flushed work; released WAL is never redelivered."""
        self.offsets.confirm(lsn)
