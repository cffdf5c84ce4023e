"""Streaming CDC plane: pgoutput decode → sequence → marshal → stream.

Reference: the subscription package (pkg/subscription/) — receive loop,
binary decode (pkg/logical/decoder.go), transaction sequencing
(pkg/subscription/sequence.go), relation-cache marshal
(pkg/subscription/changelog.go, marshal.go), confirmed-LSN offsets
(pkg/subscription/stream.go:47-55).

The wire format implemented here is PostgreSQL's public *pgoutput*
logical streaming replication protocol (PostgreSQL docs, "Logical
Streaming Replication Protocol" / protocol message formats).
"""

from pgsink_spark.streaming.decoder import (
    Begin,
    Commit,
    Delete,
    Insert,
    Origin,
    Relation,
    RelationColumn,
    Truncate,
    TypeMessage,
    Update,
    decode_message,
)
from pgsink_spark.streaming.sequence import SequencedMessage, Sequencer
from pgsink_spark.streaming.marshal import RelationCache, marshal
from pgsink_spark.streaming.offsets import OffsetStore

__all__ = [
    "Begin",
    "Commit",
    "Delete",
    "Insert",
    "OffsetStore",
    "Origin",
    "Relation",
    "RelationCache",
    "RelationColumn",
    "SequencedMessage",
    "Sequencer",
    "Truncate",
    "TypeMessage",
    "Update",
    "decode_message",
    "marshal",
]
