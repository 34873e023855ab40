"""Per-data-file key bloom sidecars (``<file>.parquet.bloom``).

100-TB rationale: hash-partition routing already prunes a point lookup
to 1/P of the lake, but within a partition every delta file holds a
random subset of the key domain, so parquet row-group min/max stats on
``doc_id`` never prune anything. A small bloom filter per data file
(10 bits/key, k=7, ~1% false positives, no false negatives) lets
``Lake.lookup`` skip the delta files that cannot contain the probed
keys — the Iceberg/HBase file-skipping analog for the CDC lake's
serving path. The reference has no point-read surface (Canal clients
build their own stores, e.g. the example ES/HBase adapters); this is
the lake-side primitive such an adapter needs at scale.

Format: one JSON header line + raw little-endian uint64 words.
Sidecars are advisory: a missing/corrupt sidecar means "read the file"
(never wrong, just slower), so old lakes and partially-written
sidecars degrade gracefully.

Key hashing reuses :func:`state.partitioning.stable_hash` (the same
SipHash the partition router uses) so one hash pass serves both
routing and bloom probes.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import lru_cache

import numpy as np

from clever_canal_ray.state.partitioning import stable_hash

BLOOM_SUFFIX = ".bloom"
_BITS_PER_KEY = 10
_K = 7
_U64 = np.uint64


def key_hashes(doc_ids) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) probe hashes for an array of keys; h2 derives from h1
    via the shared splitmix64 finalizer (functions/corpus — ONE
    implementation repo-wide; bit-identical on uint64 input), forced
    odd so the double-hashing stride never collapses."""
    from clever_canal_ray.functions.corpus import _splitmix64

    h1 = stable_hash(doc_ids)
    h2 = _splitmix64(h1) | _U64(1)
    return h1, h2


def _probe_indices(h1: np.ndarray, h2: np.ndarray, m_bits: int) -> np.ndarray:
    """(k, n) bit indices via double hashing: idx_i = (h1 + i*h2) % m."""
    i = np.arange(_K, dtype=_U64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % _U64(m_bits)


def build_bloom(doc_ids) -> tuple[np.ndarray, int]:
    """Bloom bitset (uint64 words, m_bits) over the file's keys."""
    h1, h2 = key_hashes(doc_ids)
    m_bits = max(64, ((len(h1) * _BITS_PER_KEY + 63) // 64) * 64)
    idx = _probe_indices(h1, h2, m_bits)
    words = np.zeros(m_bits // 64, dtype=_U64)
    np.bitwise_or.at(
        words,
        (idx >> _U64(6)).astype(np.int64).ravel(),
        (_U64(1) << (idx & _U64(63))).ravel(),
    )
    return words, m_bits


def may_contain(words: np.ndarray, m_bits: int, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Per-key bool mask: False is definitive (key not in the file)."""
    idx = _probe_indices(h1, h2, m_bits)
    bits = (words[(idx >> _U64(6)).astype(np.int64)] >> (idx & _U64(63))) & _U64(1)
    return bits.all(axis=0)


def write_sidecar(data_path: str, doc_ids) -> str:
    """Write ``<data_path>.bloom`` atomically (tmp + rename — a crashed
    task leaves no partial sidecar; a retried task overwrites)."""
    words, m_bits = build_bloom(doc_ids)
    header = json.dumps(
        {"v": 1, "n": int(len(doc_ids)), "m_bits": m_bits, "k": _K, "h": "siphash+splitmix-dh"}
    ).encode()
    path = data_path + BLOOM_SUFFIX
    tmp = path + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(header + b"\n")
        f.write(words.astype("<u8").tobytes())
    os.replace(tmp, path)
    return path


# cache bound: ~4 MB/sidecar cap x 64 entries = <=256 MB per worker.
# Bigger sidecars (base files with millions of keys) bypass the cache —
# base files essentially always survive pruning anyway, so caching
# their blooms buys the least.
_CACHE_MAX_BYTES = 4 << 20


class _SidecarInvalid(Exception):
    """Raised (not cached — lru_cache never stores exceptions) so
    transient I/O errors don't pin a permanent cache miss."""


def _read_sidecar_bytes(path: str) -> tuple[bytes, int]:
    """Parse + validate; raises _SidecarInvalid on any problem so the
    caller degrades to 'read the file'."""
    try:
        with open(path, "rb") as f:
            header = json.loads(f.readline())
            if header.get("v") != 1 or header.get("k") != _K:
                raise _SidecarInvalid(path)
            m_bits = header["m_bits"]
            raw = f.read()
    except (OSError, ValueError, KeyError) as e:
        raise _SidecarInvalid(path) from e
    # m_bits must be a positive multiple of 64 that matches the body,
    # or probe indexing would divide by zero / misalign
    if not isinstance(m_bits, int) or m_bits <= 0 or m_bits % 64 or len(raw) * 8 != m_bits:
        raise _SidecarInvalid(path)
    return raw, m_bits


_cached_read = lru_cache(maxsize=64)(_read_sidecar_bytes)


def load_sidecar(data_path: str) -> tuple[np.ndarray, int] | None:
    """(words, m_bits) or None when absent/unreadable (advisory).

    Successful loads are LRU-cached per process (data files are
    immutable — uuid-named, written once via atomic rename — so a
    PRESENT sidecar's content never changes). Failures are never
    cached: an absent sidecar may be written later (pre-sidecar lakes
    gain them as compaction rewrites files) and an I/O error may be
    transient. Sidecars above _CACHE_MAX_BYTES bypass the cache to
    bound worker memory."""
    path = data_path + BLOOM_SUFFIX
    try:
        if os.path.getsize(path) > _CACHE_MAX_BYTES:
            raw, m_bits = _read_sidecar_bytes(path)
        else:
            raw, m_bits = _cached_read(path)
    except (OSError, _SidecarInvalid):
        return None
    return np.frombuffer(raw, dtype="<u8").astype(_U64, copy=False), m_bits


def file_may_contain_any(data_path: str, h1: np.ndarray, h2: np.ndarray) -> bool:
    """True unless the sidecar proves NONE of the keys are present."""
    side = load_sidecar(data_path)
    if side is None:
        return True
    words, m_bits = side
    return bool(may_contain(words, m_bits, h1, h2).any())
