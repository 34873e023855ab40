"""Stable hash partitioning of doc_ids -> lake partitions.

The lake is hash-partitioned by primary key (``doc_id``) — the analog
of Canal's one-destination-per-instance sharding
(CanalInstanceWithManager.java:184-221) made dynamic: P logical
partitions, each owned by exactly one reduce task per micro-batch
(single-writer-per-partition invariant, SURVEY.md §3 summary).

The hash must be deterministic across processes and runs (it is
persisted implicitly in the lake layout), so we use pandas'
SipHash-based ``hash_array`` with its fixed default key — NOT Python's
per-process-salted ``hash()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def stable_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of an array of strings."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def partition_ids(doc_ids, num_partitions: int) -> np.ndarray:
    """doc_id -> partition id in [0, num_partitions)."""
    return (stable_hash(doc_ids) % np.uint64(num_partitions)).astype(np.int32)


def salted_partition_ids(doc_ids, num_partitions: int, salt_factor: int, positions) -> np.ndarray:
    """Skew-handling variant: spread each partition over ``salt_factor``
    sub-partitions by position, so a hot key's events fan out across
    reducers; the de-salt merge (last-writer-wins on the packed
    position) restores correctness (SURVEY.md §4 skew row).
    """
    base = partition_ids(doc_ids, num_partitions).astype(np.int64)
    salt = np.asarray(positions, dtype=np.int64) % salt_factor
    return (base * salt_factor + salt).astype(np.int32)
