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
    """Whole frames only: a file truncated mid-frame (crash during an
    append) reads cleanly up to the last complete frame, matching
    iter_capture_from's contract."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                return out
            (n,) = struct.unpack(">I", head)
            buf = f.read(n)
            if len(buf) < n:
                return out
            out.append(buf)


def iter_capture_from(path: str, offset: int = 0):
    """Yield (byte_offset, frame) from ``offset`` (a frame boundary)."""
    # 1 MiB buffer: frames are tiny (tens of bytes), so the default
    # 8 KiB buffer pays a syscall every ~200 frames on the decode path
    with open(path, "rb", buffering=1 << 20) as f:
        f.seek(offset)
        pos = offset
        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (n,) = struct.unpack(">I", head)
            buf = f.read(n)
            if len(buf) < n:
                return
            yield pos, buf
            pos += 4 + n


class CaptureIndex:
    """Commit-boundary byte index over a capture file.

    A WAL capture is append-only and unbounded; without an index every
    ``latestOffset`` poll and every micro-batch ``read`` rescans the
    file from byte 0 — O(stream²) over a stream's lifetime, the classic
    tail-read bug. The index records, per commit, the byte offset just
    PAST that commit's frame, plus the running list of relation-message
    offsets seen so far. ``read(start, end)`` then seeks to the largest
    indexed commit ≤ start, replays only the (tiny) relation frames
    before it to rebuild the relation cache, and decodes forward —
    per-batch cost is O(new bytes + relations), not O(file).

    The index lives in memory keyed by the scanned prefix length and is
    rebuilt incrementally: a poll scans only bytes appended since the
    previous poll. It is a pure cache — losing it costs a rescan, never
    correctness — so it needs no durability or locking (each reader
    instance owns its own).
    """

    def __init__(self, path: str):
        self.path = path
        self.scanned = 0  # bytes of the file covered by the entries
        self.top_lsn = 0
        # ascending (commit_lsn, next_byte_offset, n_relations_seen)
        self.commits: list[tuple[int, int, int]] = []
        self.rel_offsets: list[int] = []

    def refresh(self) -> int:
        """Scan newly appended bytes; return the highest commit LSN."""
        from pgsink_spark.streaming.decoder import (
            Commit,
            Relation,
            decode_message,
        )

        if not os.path.exists(self.path):
            return self.top_lsn
        size = os.path.getsize(self.path)
        if size <= self.scanned:
            return self.top_lsn
        pos = self.scanned
        for pos, buf in iter_capture_from(self.path, self.scanned):
            msg = decode_message(buf)
            if isinstance(msg, Relation):
                self.rel_offsets.append(pos)
            elif isinstance(msg, Commit):
                self.top_lsn = max(self.top_lsn, msg.commit_lsn)
                self.commits.append(
                    (msg.commit_lsn, pos + 4 + len(buf), len(self.rel_offsets))
                )
            self.scanned = pos + 4 + len(buf)
        return self.top_lsn

    def offset_after(self, commit_lsn: int) -> int | None:
        """Byte offset just past the given commit's frame (None when
        the LSN is not an indexed commit)."""
        for lsn, off, _n in self.commits:
            if lsn == commit_lsn:
                return off
        return None

    def seek_point(self, start_lsn: int) -> tuple[int, list[int]]:
        """(byte offset, relation offsets to replay) for a range read
        beginning strictly after ``start_lsn``. Commits are recorded in
        arrival order, which is LSN order on a single WAL."""
        best = (0, 0)
        for lsn, off, nrel in self.commits:
            if lsn <= start_lsn:
                best = (off, nrel)
            else:
                break
        off, nrel = best
        return off, self.rel_offsets[:nrel]


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
    # index-derived seek plan: decode from seek_offset instead of byte
    # 0, after replaying the relation frames at rel_offsets to rebuild
    # the relation cache (safe defaults = full scan); stop_offset ends
    # the scan at the slice's last commit instead of EOF
    seek_offset: int = 0
    rel_offsets: tuple = ()
    stop_offset: int | None = None


class PgoutputStreamReader(DataSourceStreamReader):
    """LSN-offset stream over a pgoutput capture file."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.start_from = int(options.get("startlsn", "0"))
        # backpressure (the reference bounds its channel buffers,
        # importer.go:107; Spark sources bound the OFFSET RANGE):
        # each micro-batch advances at most this many commits past the
        # last planned offset, so a deep capture backlog drains as
        # bounded batches instead of one giant catch-up batch
        self.max_commits = int(options.get("maxcommitspertrigger", "0"))
        self.options_maxpartitions = int(options.get("maxpartitions", "1"))
        # scope for the planned-watermark sidecar (bounded drain). Two
        # queries reading the same capture with the same scope would
        # share one watermark and the later one would lose backpressure
        # pacing — pass a per-query id (e.g. derived from the
        # checkpoint location) to give each drain its own sidecar.
        self.drain_id = options.get("drainid", "")
        # driver-side tail index: each poll scans only appended bytes,
        # each batch read seeks — O(new data) per batch, not O(file)
        self._index = CaptureIndex(self.path)
        self._last_planned = self.start_from

    def initialOffset(self) -> dict:
        return {"lsn": self.start_from}

    def latestOffset(self) -> dict:
        top = max(self.start_from, self._index.refresh())
        if self.max_commits > 0:
            # the planned watermark persists in a sidecar (monotonic,
            # same OffsetStore contract as the confirmed file) so a
            # restarted reader — each availableNow run builds a fresh
            # one — continues the bounded drain instead of re-planning
            # the same first window. Sizing metadata only: a stale or
            # shared sidecar can only make a batch larger, never skip
            # or duplicate data (offsets own correctness; partitions()
            # reads strictly (start, end] from the checkpointed start).
            # The sidecar is scoped by `drainid` so concurrent queries
            # over one capture don't share a watermark.
            from pgsink_spark.streaming.offsets import OffsetStore

            suffix = f".planned.{self.drain_id}" if self.drain_id else ".planned"
            store = OffsetStore(self.path + suffix)
            start = max(self._last_planned, store.confirmed_lsn or 0)
            ahead = [lsn for lsn, _off, _n in self._index.commits if lsn > start]
            if len(ahead) > self.max_commits:
                top = ahead[self.max_commits - 1]
            if top > (store.confirmed_lsn or 0):
                store.confirm(top)
        self._last_planned = max(self._last_planned, top)
        return {"lsn": top}

    def partitions(self, start: dict, end: dict):
        # WAL total order is DATA — (lsn, sequence) on every row — not
        # partition order: sinks elect rows by that key at read time,
        # so a batch may decode in parallel. The commit index lets us
        # split the LSN range at commit boundaries into `maxpartitions`
        # contiguous slices, each with its own seek offset + relation
        # replay list; decode throughput then scales with cores
        # (~100k rows/s/core) instead of being the single-threaded
        # stage the reference has. Default 1 keeps strict arrival
        # order for consumers that want it.
        self._index.refresh()
        n = max(1, int(self.options_maxpartitions))
        cuts = [
            lsn
            for lsn, _off, _nr in self._index.commits
            if start["lsn"] < lsn <= end["lsn"]
        ]
        if n <= 1 or len(cuts) <= 1:
            seek, rels = self._index.seek_point(start["lsn"])
            return [
                _RangePartition(
                    self.path, start["lsn"], end["lsn"], seek, tuple(rels)
                )
            ]
        n = min(n, len(cuts))
        # n contiguous commit groups; boundaries on commit LSNs
        bounds = [start["lsn"]]
        for i in range(1, n):
            bounds.append(cuts[len(cuts) * i // n - 1])
        bounds.append(end["lsn"])
        parts = []
        for lo, hi in zip(bounds, bounds[1:]):
            if lo >= hi:
                continue
            seek, rels = self._index.seek_point(lo)
            parts.append(
                _RangePartition(
                    self.path, lo, hi, seek, tuple(rels),
                    self._index.offset_after(hi),
                )
            )
        return parts

    def read(self, partition: _RangePartition):
        from pgsink_spark.streaming.marshal import RelationCache, marshal
        from pgsink_spark.streaming.decoder import decode_message
        from pgsink_spark.streaming.sequence import Sequencer

        cache = RelationCache()
        seq = Sequencer()
        # relation frames that precede the seek point: replay just them
        # (each is a seek + one tiny frame read) so DML after the seek
        # finds its table even when its Relation message is far behind
        if partition.rel_offsets:
            with open(partition.path, "rb") as f:
                for off in partition.rel_offsets:
                    f.seek(off)
                    (n,) = struct.unpack(">I", f.read(4))
                    cache.register(decode_message(f.read(n)))
        # Arrow-batched emit: the Python source's per-row pickle is the
        # hot-path killer (measured: tuple yield caps the e2e stream at
        # ~8k rows/s while the decode loop itself does ~100k). Yielding
        # pyarrow.RecordBatch moves the source→JVM hop to Arrow
        # columnar transfer; rows buffer per ARROW_BATCH rows.
        import pyarrow as pa

        ARROW_BATCH = 8192
        cols: list[list] = [[], [], [], [], [], [], []]

        def flush_batch():
            batch = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.timestamp("us")),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.int64()),
                    pa.array(cols[4], pa.int64()),
                    pa.array(cols[5], pa.map_(pa.string(), pa.string())),
                    pa.array(cols[6], pa.map_(pa.string(), pa.string())),
                ],
                names=[
                    "timestamp",
                    "namespace",
                    "name",
                    "lsn",
                    "sequence",
                    "before",
                    "after",
                ],
            )
            for c in cols:
                c.clear()
            return batch

        if not os.path.exists(partition.path):
            return  # nothing captured yet: an empty (start==end) batch
        stop = partition.stop_offset
        for _pos, buf in iter_capture_from(
            partition.path, partition.seek_offset
        ):
            if stop is not None and _pos >= stop:
                break
            sm = seq.feed(decode_message(buf))
            if sm is None:
                continue
            mod = marshal(cache, sm)
            if mod is None:
                continue
            # half-open (start, end]: replay exactness across batches
            if not (partition.start_lsn < mod.lsn <= partition.end_lsn):
                continue
            before, after = _stringify(mod.before), _stringify(mod.after)
            cols[0].append(mod.timestamp.replace(tzinfo=None))
            cols[1].append(mod.namespace)
            cols[2].append(mod.name)
            cols[3].append(mod.lsn)
            cols[4].append(mod.sequence)
            cols[5].append(None if before is None else list(before.items()))
            cols[6].append(None if after is None else list(after.items()))
            if len(cols[0]) >= ARROW_BATCH:
                yield flush_batch()
        if cols[0]:
            yield flush_batch()

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
