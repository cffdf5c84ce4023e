"""Incremental JOIN-view maintenance (IVM): keep a materialized inner
equi-join ``A ⋈ B`` current from the two tables' envelope batches,
without recomputing from the base tables.

Together with the compactor (latest-per-key rows) and IncrementalAgg
(GROUP-BY sums/counts), this completes the serving layer's IVM family:
joins are the remaining self-maintainable view class a CDC consumer
needs (the warehouse "enriched fact" table that today gets rebuilt
nightly).

Semantics are Z-sets (rows with an integer multiplicity, the DBSP /
differential-dataflow formulation): an envelope row contributes
``+1·after`` and ``−1·before``, so INSERT/UPDATE/DELETE all become
signed rows and multiple changes to one key inside a batch cancel
algebraically. The bilinear delta rule for a join is

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

with multiplicities multiplying across the join — three joins whose
inputs are (batch × state), (state × batch), (batch × batch), never
(state × state). Each side's state and the view itself are Z-set
parquet tables merged per batch with the same touched-key pruning as
IncrementalAgg: rows whose key appears in the batch are merged, the
rest pass through via an anti-join.

At 100 TB: per-batch cost is O(batch ⋈ touched-state + touched keys);
the full base tables are never re-joined, and the state⋈batch joins
prune the state side to the batch's join keys first (broadcast
semi-join) so a small batch touches a small slice of state no matter
how large the tables grow. FK-repoint updates (the join column itself
changes) need no special case: the before-image retracts the old
pairing, the after-image asserts the new one.

Reference parity: pgsink stops at most-recent-row views
(pkg/sinks/bigquery/schema_builders.go view semantics); join/aggregate
maintenance is the downstream-warehouse work this engine folds in.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _zset(env: DataFrame, cols: list[str]) -> DataFrame:
    """Envelope batch → Z-set over the payload columns: +1·after,
    −1·before, summed per distinct row (in-batch chains cancel)."""

    def side(img: str, sign: int) -> DataFrame:
        return env.where(F.col(img).isNotNull()).select(
            *[F.col(f"{img}.{c}").alias(c) for c in cols],
            F.lit(sign).alias("mult"),
        )

    return (
        side("after", 1)
        .unionByName(side("before", -1))
        .groupBy(*cols)
        .agg(F.sum("mult").cast("bigint").alias("mult"))
        .where(F.col("mult") != 0)
    )


def _join_mult(a: DataFrame, b: DataFrame, on: str) -> DataFrame:
    """Z-set join: inner equi-join, multiplicities multiply."""
    am = a.withColumnRenamed("mult", "mult_a")
    bm = b.withColumnRenamed("mult", "mult_b")
    return (
        am.join(bm, on)
        .withColumn("mult", (F.col("mult_a") * F.col("mult_b")).cast("bigint"))
        .drop("mult_a", "mult_b")
    )


def _with_mult(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField("mult", T.LongType(), True)]
    )


class IncrementalJoinView:
    """Materialized ``A JOIN B ON A.join_col = B.join_col`` maintained
    from envelope batches of both tables.

    ``schema_a``/``schema_b`` are the payload StructTypes (first field
    of each = that side's primary key, used for merge pruning). B-side
    columns whose names collide with A's get a ``b_`` prefix in the
    view; the join column appears once. ``apply_batch(env_a, env_b)``
    is foreachBatch-compatible; pass None for a side with no changes.
    Replay watermarks are tracked PER CHANNEL (a-only / b-only / both),
    so the two sides may be driven by one stream split by table name or
    by two independent streaming queries whose batch ids both start at
    0 — neither wiring can alias the other's epochs into false replays.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema_a: T.StructType,
        schema_b: T.StructType,
        join_col: str,
    ):
        self.spark = spark
        self.path = path
        self.schema_a = schema_a
        self.schema_b = schema_b
        self.join_col = join_col
        self.cols_a = [f.name for f in schema_a.fields]
        self.cols_b = [f.name for f in schema_b.fields]
        if join_col not in self.cols_a or join_col not in self.cols_b:
            raise ValueError(f"join column {join_col!r} missing on a side")
        # view-side names for B: prefix collisions, keep the join col
        # (it is represented once, by A's copy)
        self._b_renames = {
            c: (f"b_{c}" if c in self.cols_a and c != join_col else c)
            for c in self.cols_b
        }
        self.view_schema = T.StructType(
            list(schema_a.fields)
            + [
                T.StructField(self._b_renames[f.name], f.dataType, True)
                for f in schema_b.fields
                if f.name != join_col
            ]
        )
        self.view_cols = [f.name for f in self.view_schema.fields]
        self.pk_a = self.cols_a[0]
        self.pk_b = self._b_renames[self.cols_b[0]]

    # -- epoch-versioned state (exactly-once under replay) ----------------
    #
    # foreachBatch delivers at-least-once: a crashed micro-batch is
    # re-run with the SAME epoch id. Z-set deltas are not idempotent,
    # so state is committed like Structured Streaming's own sinks: each
    # epoch writes NEW directories derived from the previous epoch's
    # immutable ones, then an atomic manifest rename publishes the
    # consistent triple. A replayed epoch <= the manifest's is skipped
    # outright; a crash mid-epoch leaves the old manifest pointing at
    # the old dirs, so the retry re-derives from unchanged inputs.
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _publish(
        self, seq: int, epochs: dict[str, int], dirs: dict[str, str]
    ) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"seq": seq, "epochs": epochs, "dirs": dirs}, f)
        os.replace(tmp, self._manifest_path())
        self._gc(dirs)

    @staticmethod
    def _epochs(man: dict | None) -> dict[str, int]:
        """Per-channel replay watermarks. The A and B sides may be fed
        by two INDEPENDENT streaming queries, each with its own batch-id
        sequence starting at 0 — a single global watermark would
        silently skip the second query's batches as replays. Channels:
        'a' (only env_a), 'b' (only env_b), 'ab' (both, one stream
        split by table). Older manifests carried one 'epoch'; migrate
        it to all channels (single-stream deployments, semantics kept)."""
        if man is None:
            return {"a": -1, "b": -1, "ab": -1}
        if "epochs" in man:
            return dict(man["epochs"])
        legacy = man.get("epoch", -1)
        return {"a": legacy, "b": legacy, "ab": legacy}

    def _gc(self, live: dict[str, str]) -> None:
        keep = set(live.values())
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if os.path.isdir(full) and d not in keep:
                shutil.rmtree(full, ignore_errors=True)

    def _empty(self, schema: T.StructType) -> DataFrame:
        return self.spark.createDataFrame([], _with_mult(schema))

    def _read_state(self, name: str, schema: T.StructType) -> DataFrame:
        man = self._manifest()
        if man and name in man["dirs"]:
            return self.spark.read.parquet(
                os.path.join(self.path, man["dirs"][name])
            )
        return self._empty(schema)

    def _merge_state(
        self,
        name: str,
        epoch: int,
        current: DataFrame,
        delta: DataFrame,
        key: list[str],
    ) -> str:
        """Z-set merge keyed on ``key`` into a fresh epoch directory:
        state rows whose key appears in the batch are re-summed with
        the delta, the rest pass through untouched (anti-join pruning —
        the merge never reads unaffected keys' rows into the shuffle).
        Returns the directory name for the manifest."""
        man = self._manifest()
        if man and name in man["dirs"]:
            keys = delta.select(*key).distinct()
            untouched = current.join(F.broadcast(keys), key, "left_anti")
            touched = current.join(F.broadcast(keys), key, "left_semi")
            merged = (
                touched.unionByName(delta)
                .groupBy(*[c for c in delta.columns if c != "mult"])
                .agg(F.sum("mult").cast("bigint").alias("mult"))
                .where(F.col("mult") != 0)
                .unionByName(untouched)
            )
        else:
            merged = delta
        out = f"{name}_{epoch}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, out))
        return out

    def _bview(self, df: DataFrame) -> DataFrame:
        for c, v in self._b_renames.items():
            if c != v:
                df = df.withColumnRenamed(c, v)
        return df

    # -- maintenance ------------------------------------------------------
    def apply_batch(
        self,
        env_a: DataFrame | None,
        env_b: DataFrame | None,
        _epoch_id: int | None = None,
    ) -> int:
        """Fold one batch of changes from either/both sides into the
        view; returns the number of view delta rows (assertions +
        retractions, before cancellation)."""
        man = self._manifest()
        epochs = self._epochs(man)
        channel = "ab" if env_a is not None and env_b is not None else (
            "a" if env_a is not None else "b"
        )
        if _epoch_id is not None and _epoch_id <= epochs[channel]:
            return 0  # at-least-once replay of a committed epoch: skip
        seq = (man["seq"] if man and "seq" in man
               else man.get("epoch", -1) if man else -1) + 1
        epochs[channel] = _epoch_id if _epoch_id is not None else epochs[channel] + 1
        epoch = seq  # monotone internal sequence names state dirs
        a_old = self._read_state("a_state", self.schema_a)
        b_old = self._read_state("b_state", self.schema_b)
        da = (
            _zset(env_a, self.cols_a).localCheckpoint(eager=True)
            if env_a is not None
            else self._empty(self.schema_a)
        )
        db = (
            _zset(env_b, self.cols_b).localCheckpoint(eager=True)
            if env_b is not None
            else self._empty(self.schema_b)
        )
        on = self.join_col
        dm = (
            _join_mult(da, self._bview(b_old), on)
            .unionByName(_join_mult(a_old, self._bview(db), on))
            .unionByName(_join_mult(da, self._bview(db), on))
            .select(*self.view_cols, "mult")
            .localCheckpoint(eager=True)
        )
        touched = dm.count()
        view_old = self._read_state("view", self.view_schema)
        # when B's pk IS the join column (dim keyed by the FK), A's pk
        # alone identifies a view row — dedupe the merge key
        vkey = list(dict.fromkeys([self.pk_a, self.pk_b]))
        dirs = {
            "view": self._merge_state("view", epoch, view_old, dm, vkey),
            "a_state": self._merge_state(
                "a_state", epoch, a_old, da, [self.pk_a]
            ),
            "b_state": self._merge_state(
                "b_state", epoch, b_old, db, [self.cols_b[0]]
            ),
        }
        self._publish(seq, epochs, dirs)
        return touched

    # -- serving ----------------------------------------------------------
    def read(self) -> DataFrame:
        """The maintained join view (multiplicity dropped — keyed CDC
        inputs always yield mult=1 rows)."""
        return self._read_state("view", self.view_schema).drop("mult")
