"""clever_canal_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *capabilities* of clever-canal
(an annotated Alibaba Canal fork: MySQL-binlog CDC service node,
reference at /root/reference) on idiomatic Ray Data primitives:

- Canal-style change events (INSERT/UPDATE/DELETE with before/after row
  images, transaction framing, DDL schema-evolution events) read as
  Parquet "binlog segment" files into ``ray.data.Dataset`` pipelines
  (SURVEY.md S2: LocalBinLogConnection analog).
- Stateless zero-copy Arrow ``map_batches`` stages replace
  EventParser/EntryEventSink (P3/P4, F1-F6).
- One hash shuffle (``groupby(pid)``) + vectorized per-partition
  last-writer-wins reduce replaces the client-side apply (O7/O9).
- Merge-on-read upsert into a hash-partitioned Parquet lake with a
  two-phase manifest commit replaces MetaManager/EventStore ack
  bookkeeping (T4/T5/T6, D1-D3) — exactly-once via per-lake
  high-water-mark + idempotent batch ledger.
- A TableMetaTSDB-style schema journal (snapshot + replay, additive /
  widening DDL only) provides schema evolution (T3).

See SURVEY.md for the full reference→Ray mapping.
"""

__version__ = "0.1.0"

from clever_canal_ray.schema import (  # noqa: F401
    LAKE_SCHEMA_V0,
    event_schema,
    lake_schema,
)
