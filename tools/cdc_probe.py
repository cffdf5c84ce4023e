"""CDC throughput probe: synthesize a pgoutput capture from the orders
fixture at $SF (default sf0.1, ~150k rows), stream it through the full
front door (DSv2 source → decode → marshal → typed cast → warehouse
sink with epoch exactly-once), and report rows/s for (a) the pure
decode+marshal loop and (b) the end-to-end streaming run. Results are
recorded in SCALE.md.

Run: python tools/cdc_probe.py [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import time
from datetime import timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pgsink_spark.streaming.datasource import append_capture  # noqa: E402
from pgsink_spark.streaming.decoder import (  # noqa: E402
    Relation,
    RelationColumn,
    encode_begin,
    encode_commit,
    encode_insert,
    encode_relation,
)

REL = Relation(
    oid=77001,
    namespace="public",
    name="orders",
    replica_identity=0,
    columns=(
        RelationColumn(key=True, name="o_orderkey", type_oid=20, modifier=-1),
        RelationColumn(key=False, name="o_custkey", type_oid=20, modifier=-1),
        RelationColumn(key=False, name="o_orderstatus", type_oid=25, modifier=-1),
        RelationColumn(key=False, name="o_totalprice", type_oid=701, modifier=-1),
    ),
)

TXN_SIZE = 500


def build_capture(sf_dir: str, path: str) -> int:
    rows = duckdb.sql(
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
        f"FROM '{sf_dir}/orders.parquet' ORDER BY o_orderkey"
    ).fetchall()
    rows = rows * int(os.environ.get("PROBE_REPEAT", "1"))
    ts = datetime.datetime(2024, 6, 1, tzinfo=timezone.utc)
    frames = []
    lsn = 0
    for i in range(0, len(rows), TXN_SIZE):
        lsn += 100
        frames.append(encode_begin(lsn, ts, i // TXN_SIZE + 1))
        if i == 0:
            frames.append(encode_relation(REL))
        for r in rows[i : i + TXN_SIZE]:
            frames.append(
                encode_insert(
                    REL.oid, tuple(str(v).encode() for v in r)
                )
            )
        frames.append(encode_commit(0, lsn, lsn + 1, ts))
    append_capture(path, frames)
    return len(rows)


def probe_decode(path: str) -> float:
    """Pure Python decode+sequence+marshal loop (the executor inner loop)."""
    from pgsink_spark.streaming.datasource import iter_capture_from
    from pgsink_spark.streaming.decoder import decode_message
    from pgsink_spark.streaming.marshal import RelationCache, marshal
    from pgsink_spark.streaming.sequence import Sequencer

    cache, seq, n = RelationCache(), Sequencer(), 0
    t0 = time.time()
    for _pos, buf in iter_capture_from(path, 0):
        sm = seq.feed(decode_message(buf))
        if sm is None:
            continue
        if marshal(cache, sm) is not None:
            n += 1
    dt = time.time() - t0
    return n / dt


def probe_e2e(path: str, work: str) -> tuple[int, float]:
    from pyspark.sql import types as T

    from pgsink_spark.changelog.envelope import cast_envelope
    from pgsink_spark.changelog.registry import SchemaEntry, entry_from_relation
    from pgsink_spark.session import get_spark
    from pgsink_spark.sinks.warehouse import WarehouseSink
    from pgsink_spark.streaming.datasource import register

    spark = get_spark("cdc-probe")
    register(spark)
    wh = WarehouseSink(spark, os.path.join(work, "wh"))
    entry = entry_from_relation(REL)
    wh.handle_schema(entry)

    def flush(df, bid):
        wh.insert(
            cast_envelope(df, entry.payload),
            "public",
            "orders",
            cluster=os.environ.get("PROBE_CLUSTER", "1") == "1",
            epoch=bid,
        )

    t0 = time.time()
    q = (
        spark.readStream.format("pgoutput")
        .option("path", path)
        .option("maxpartitions", os.environ.get("PROBE_PARTS", "8"))
        .load()
        .writeStream.foreachBatch(flush)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.time() - t0
    n = spark.read.parquet(
        os.path.join(work, "wh", "public_orders_raw")
    ).count()
    spark.stop()
    return n, n / dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = "/tmp/cdc_probe"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cap = os.path.join(work, "wal.capture")
    n = build_capture(sf_dir, cap)
    size_mb = os.path.getsize(cap) / 1e6
    decode_rps = probe_decode(cap)
    rows, e2e_rps = probe_e2e(cap, work)
    assert rows == n, (rows, n)
    print(
        f"rows={n} capture={size_mb:.1f}MB "
        f"decode_rows_per_s={decode_rps:.0f} "
        f"e2e_rows_per_s={e2e_rps:.0f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
