"""Pluggable storage backends for lake/manifest I/O.

The manifest commit protocol (state/manifest.py) needs exactly five
storage capabilities, all of which every major object store offers:

- **atomic PUT** of a whole object (readers never observe a partial
  write) — ``put_text`` / plain parquet writes of uniquely-named files;
- **GET** — ``get_text``;
- **LIST / DELETE / stat** — gc and journal reads;
- **conditional PUT (compare-and-swap)** on ONE small pointer object —
  ``swap_pointer``: publish a new ``_CURRENT`` value only if the stored
  value still equals what the writer read when it started. This is the
  single linearization point of a commit (S3 ``If-Match`` /
  ``If-None-Match`` conditional writes, GCS ``x-goog-if-generation-
  match``, ABS ETag conditions, or a catalog row CAS à la Iceberg);
- **no appends, no renames** of committed objects — the protocol never
  mutates an object after it is first written (manifests and data files
  are uniquely named; the full-history ledger is per-record objects on
  object stores, an appendable journal on POSIX).

Two implementations:

- :class:`PosixStorage` — local/NFS filesystems. Atomic PUT via
  write-temp + ``os.replace``; pointer CAS serialized by an
  ``O_CREAT|O_EXCL`` lock file; the history journal is a single
  appendable ``.jsonl``.
- :class:`ObjectStoreStorage` — the object-store CONTRACT, emulated
  over a local directory so Ray tasks in this sandbox can read the same
  paths parquet was written to. It never relies on POSIX append or
  deterministic-name overwrite: journals are one immutable object per
  record, and the pointer swap implements conditional-PUT semantics
  (the local lock below stands in for the store's native condition; a
  real adapter replaces ``swap_pointer``/``put_text`` bodies with SDK
  calls and keeps everything above this interface unchanged).

A lake's backend choice is stamped in ``<lake>/_manifest/_STORAGE`` by
:meth:`ObjectStoreStorage.format` so every later ``Lake(dir)`` — in
tests, CLI tools, or Ray workers — resolves the same backend via
:func:`storage_for`.

Reference parity note: the reference keeps its positions/meta either on
local disk or ZooKeeper (PeriodMixedMetaManager / ZooKeeperMetaManager,
meta/.../ZooKeeperMetaManager.java) — the CAS pointer here plays the
zk-node role for shared deployments.
"""

from __future__ import annotations

import os
import time
import uuid


class StorageCASError(Exception):
    """Conditional PUT failed: the pointer moved under the writer."""


_LOCK_STALE_SEC = 30.0  # break a lock this old (crashed writer)
_LOCK_WAIT_SEC = 30.0  # give up waiting for a live writer after this


class PosixStorage:
    """Local / NFS filesystem backend (the default)."""

    name = "posix"

    # -- whole objects ----------------------------------------------------

    def get_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put_text(self, path: str, text: str) -> None:
        """Atomic full-object write (PUT): readers see old or new,
        never a torn file."""
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def list_names(self, path: str) -> list[str]:
        """Basenames under a directory/prefix ([] if absent)."""
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def makedirs(self, path: str) -> None:
        """Prefix creation (no-op on real object stores)."""
        os.makedirs(path, exist_ok=True)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    # -- the pointer (CAS) ------------------------------------------------

    def read_pointer(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def swap_pointer(
        self, path: str, value: str, expected: str | None, force: bool = False
    ) -> None:
        """Compare-and-swap the pointer: succeed only if its current
        value equals ``expected`` (None = must not exist yet). ``force``
        skips the comparison (admin rollback). Concurrent swappers are
        serialized by a lock file; readers never take the lock (the
        pointer file itself is replaced atomically)."""
        with self._pointer_lock(path):
            cur = self.read_pointer(path)
            if not force and cur != expected:
                raise StorageCASError(
                    f"pointer {path}: expected {expected!r}, found {cur!r}"
                )
            self.put_text(path, value)

    def _pointer_lock(self, path: str):
        return _FileLock(path + ".lock")

    # -- append-only history journal --------------------------------------

    def append_journal(self, path: str, line: str) -> None:
        with open(path, "a") as f:
            f.write(line.rstrip("\n") + "\n")

    def journal_lines(self, path: str) -> list[str]:
        out = []
        if os.path.exists(path):
            with open(path) as f:
                out = [ln for ln in f.read().splitlines() if ln.strip()]
        return out


class ObjectStoreStorage(PosixStorage):
    """S3-like backend: the commit protocol restricted to object-store
    semantics (see module docstring). Emulated over a local directory;
    a production adapter swaps the bodies of ``put_text`` /
    ``swap_pointer`` / ``list_names`` / ``delete`` for SDK calls — the
    manifest protocol above this interface is already append-free,
    rename-free, and CAS-based."""

    name = "objectstore"

    MARKER = "_STORAGE"

    @staticmethod
    def format(lake_dir: str) -> "ObjectStoreStorage":
        """Stamp ``lake_dir`` as object-store-backed (call BEFORE
        ``Lake.create``); every later ``Lake(dir)`` resolves this
        backend via :func:`storage_for`."""
        return ObjectStoreStorage.format_state(os.path.join(lake_dir, "_manifest"))

    @staticmethod
    def format_state(state_dir: str) -> "ObjectStoreStorage":
        """Stamp a plain state directory (consumer meta / derived
        state) as object-store-backed; resolved by
        :func:`storage_for_state`."""
        os.makedirs(state_dir, exist_ok=True)
        st = ObjectStoreStorage()
        st.put_text(os.path.join(state_dir, ObjectStoreStorage.MARKER), st.name)
        return st

    # put_text: a real adapter issues a single PUT (natively atomic);
    # the emulation inherits write-temp+replace purely to reproduce
    # that atomicity for concurrent local readers.

    # swap_pointer: inherited body = read-compare-write under a lock —
    # the local stand-in for S3 If-Match / GCS generation-match. The
    # CONTRACT (fail with StorageCASError when the value moved) is what
    # the commit protocol depends on.

    # -- journal: object stores cannot append ------------------------------

    def append_journal(self, path: str, line: str) -> None:
        """One immutable object per record under ``<path>.d/``."""
        d = path + ".d"
        os.makedirs(d, exist_ok=True)
        self.put_text(os.path.join(d, f"r-{uuid.uuid4().hex}.json"), line)

    def journal_lines(self, path: str) -> list[str]:
        # include a legacy single-file journal if one exists (a lake
        # migrated from posix), then the per-record objects
        out = PosixStorage.journal_lines(self, path)
        d = path + ".d"
        for name in self.list_names(d):
            with open(os.path.join(d, name)) as f:
                s = f.read().strip()
            if s:
                out.append(s)
        return out


class _FileLock:
    """O_CREAT|O_EXCL lock file with owner-verified release and
    rename-based stale-breaking — serializes pointer CAS among LOCAL
    writers (the emulation's stand-in for the store's native
    conditional PUT; a real adapter replaces swap_pointer wholesale).

    Hardening against the classic lock-file races:

    - the lock carries a unique owner token; release removes the file
      only after re-reading and matching the token, so a writer whose
      stale lock was broken can never delete a SUCCESSOR's live lock;
    - stale-breaking goes through an atomic ``os.rename`` to a unique
      name — exactly one breaker wins the rename, so two waiters can
      never both "remove" and both acquire;
    - a crashed/stalled holder past ``_LOCK_STALE_SEC`` loses mutual
      exclusion by design (lock-breaking is a liveness/safety trade
      every file-lock scheme makes); the window is 30 s and the CAS
      value-compare still rejects stale swaps afterward."""

    def __init__(self, path: str):
        self.path = path
        self.fd = None
        self.token = uuid.uuid4().hex

    def __enter__(self):
        deadline = time.monotonic() + _LOCK_WAIT_SEC
        while True:
            try:
                self.fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(self.fd, self.token.encode())
                os.fsync(self.fd)
                return self
            except FileExistsError:
                try:
                    stale = time.time() - os.path.getmtime(self.path) > _LOCK_STALE_SEC
                except FileNotFoundError:
                    continue  # holder just released; retry immediately
                if stale:
                    # atomic rename: only ONE breaker wins; the loser's
                    # rename fails and it just retries acquisition
                    broken = f"{self.path}.broken.{uuid.uuid4().hex}"
                    try:
                        os.rename(self.path, broken)
                    except FileNotFoundError:
                        continue
                    try:
                        # TOCTOU re-check: if the renamed file is FRESH,
                        # the stalled holder released and a successor
                        # acquired between our mtime check and the
                        # rename — restore the live lock instead of
                        # breaking it. Restore via os.link (create-if-
                        # absent: it FAILS on an existing destination,
                        # unlike rename, which would silently replace a
                        # third waiter's brand-new lock); if another
                        # writer claimed the name meanwhile, drop our
                        # copy. A restored lock whose owner released
                        # while displaced is ownerless and clears via
                        # the stale window — a bounded liveness hit,
                        # never a safety one.
                        if time.time() - os.path.getmtime(broken) <= _LOCK_STALE_SEC:
                            try:
                                os.link(broken, self.path)
                            except OSError:
                                pass
                            os.remove(broken)
                            continue
                        os.remove(broken)
                    except FileNotFoundError:  # pragma: no cover
                        pass
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"pointer lock busy: {self.path}")
                time.sleep(0.005)

    def __exit__(self, *exc):
        if self.fd is not None:
            os.close(self.fd)
        try:
            with open(self.path) as f:
                if f.read() != self.token:
                    return  # our lock was broken; the file is a successor's
            os.remove(self.path)
        except FileNotFoundError:
            pass


def storage_for(lake_dir: str):
    """Resolve the backend a lake was created with (the ``_STORAGE``
    marker), defaulting to POSIX. Cheap: one existence probe."""
    return storage_for_state(os.path.join(lake_dir, "_manifest"))


def storage_for_state(state_dir: str):
    """Backend resolution for a plain state directory (consumer meta,
    derived-aggregate state): the marker sits directly in the dir.
    ``ObjectStoreStorage.format_state(dir)`` stamps it."""
    marker = os.path.join(state_dir, ObjectStoreStorage.MARKER)
    try:
        with open(marker) as f:
            name = f.read().strip()
    except (FileNotFoundError, NotADirectoryError):
        return PosixStorage()
    if name == ObjectStoreStorage.name:
        return ObjectStoreStorage()
    return PosixStorage()
