"""Python DataSource V2 streaming source for pgoutput captures.

The reference's front door is a replication slot: START_REPLICATION
streams pgoutput bytes, the subscription decodes them, and the sink's
flush acks a confirmed LSN back to the slot
(pkg/subscription/subscription.go:80-111, stream.go:78-232). This
module packages that loop as a first-class Spark *streaming source*
(PySpark 4 DataSource API): offsets are LSNs, `latestOffset` discovers
new WAL, `read` decodes one LSN range, and Spark's checkpoint `commit`
drives `OffsetStore.confirm` — the exact confirmed-flush-LSN contract,
but owned by Structured Streaming's offset log.

The wire input is a *capture*: a length-prefixed file of raw pgoutput
messages (what a socket client appends as it receives XLogData — see
``replication.live_wire``; a live deployment tails the capture the
socket writer produces, which keeps the executor-side reader pure
file I/O and replayable). Row schema is the schema-agnostic envelope:
payloads as ``map<string,string>`` (SURVEY §1.1 — the typed cast stage
happens downstream via the schema registry).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GENERIC_ENVELOPE = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("namespace", StringType(), False),
        StructField("name", StringType(), False),
        StructField("lsn", LongType(), True),
        StructField("sequence", LongType(), True),
        StructField("before", MapType(StringType(), StringType()), True),
        StructField("after", MapType(StringType(), StringType()), True),
    ]
)


def append_capture(path: str, payloads: list[bytes]) -> None:
    """Append raw pgoutput messages to a capture file (u32-len framed)."""
    with open(path, "ab") as f:
        for p in payloads:
            f.write(struct.pack(">I", len(p)) + p)


def read_capture(path: str) -> list[bytes]:
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                return out
            (n,) = struct.unpack(">I", head)
            out.append(f.read(n))


def _scan_commits(path: str) -> int:
    """Highest commit LSN present in the capture (0 when empty)."""
    from pgsink_spark.streaming.decoder import Commit, decode_message

    top = 0
    for buf in read_capture(path):
        msg = decode_message(buf)
        if isinstance(msg, Commit):
            top = max(top, msg.commit_lsn)
    return top


@dataclass
class _RangePartition(InputPartition):
    path: str
    start_lsn: int
    end_lsn: int


class PgoutputStreamReader(DataSourceStreamReader):
    """LSN-offset stream over a pgoutput capture file."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.start_from = int(options.get("startlsn", "0"))

    def initialOffset(self) -> dict:
        return {"lsn": self.start_from}

    def latestOffset(self) -> dict:
        if not os.path.exists(self.path):
            return {"lsn": self.start_from}
        return {"lsn": max(self.start_from, _scan_commits(self.path))}

    def partitions(self, start: dict, end: dict):
        # WAL order is a single logical log; one partition per
        # micro-batch preserves (lsn, sequence) arrival order. Fan-out
        # happens downstream (router partitionBy), same as the
        # reference's single-threaded marshal stage.
        return [_RangePartition(self.path, start["lsn"], end["lsn"])]

    def read(self, partition: _RangePartition):
        from pgsink_spark.streaming.marshal import RelationCache, marshal
        from pgsink_spark.streaming.decoder import decode_message
        from pgsink_spark.streaming.sequence import Sequencer

        cache = RelationCache()
        seq = Sequencer()
        for buf in read_capture(partition.path):
            sm = seq.feed(decode_message(buf))
            if sm is None:
                continue
            mod = marshal(cache, sm)
            if mod is None:
                continue
            # half-open (start, end]: replay exactness across batches
            if not (partition.start_lsn < mod.lsn <= partition.end_lsn):
                continue
            yield (
                mod.timestamp.replace(tzinfo=None),
                mod.namespace,
                mod.name,
                mod.lsn,
                mod.sequence,
                _stringify(mod.before),
                _stringify(mod.after),
            )

    def commit(self, end: dict) -> None:
        """Checkpoint-commit hook → confirmed-flush LSN.

        Spark calls this when every sink for the micro-batch has
        committed; mirroring stream.Confirm + standby status. The
        offset file is what a live socket writer reads to set
        ``ReplicationClient.flush_lsn``.
        """
        from pgsink_spark.streaming.offsets import OffsetStore

        store = OffsetStore(self.path + ".confirmed")
        if store.confirmed_lsn is None or end["lsn"] > store.confirmed_lsn:
            store.confirm(end["lsn"])


def _stringify(d: dict | None) -> dict | None:
    if d is None:
        return None
    return {k: (None if v is None else str(v)) for k, v in d.items()}


class PgoutputDataSource(DataSource):
    """``spark.readStream.format("pgoutput").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "pgoutput"

    def schema(self) -> StructType:
        return GENERIC_ENVELOPE

    def streamReader(self, schema: StructType) -> PgoutputStreamReader:
        return PgoutputStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PgoutputDataSource)
