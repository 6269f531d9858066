"""Single-writer lease for a lake.

Two writers racing on one lake is the classic CDC foot-gun: per-partition
manifest commits are each idempotent, but two DIFFERENT passes interleaving
their partition commits make the final state order-dependent.  The lease
makes the single-writer assumption explicit and checkable:

* ``O_CREAT|O_EXCL`` creation of ``<lake>/_writer.lock`` (atomic on POSIX)
  containing ``{owner, pid, host, acquired_at, ttl_s}``;
* re-entrant within one process (replay's end-of-pass auto-split takes the
  lease it already holds — depth-counted, released at depth 0);
* a crashed writer's lock expires after ``ttl_s`` (wall-clock age of the
  lock file's last touch); takeover unlinks-and-retries, and the tiny
  unlink/create race between two waiters resolves to exactly one winner
  because the create is O_EXCL;
* ``renew()`` re-touches the file for long passes.

This is a SAFETY device, not a scheduler: waiting/queuing is the caller's
concern (``WriterLocked`` carries the holder's identity).  On a multi-node
cluster the lake directory is shared storage, so the same file protocol
holds; a coordination service would only be needed for sub-second
lease churn this engine doesn't do.

Reference analog: none — the reference is a one-shot CLI; Cassandra
serialized concurrent upserts for it.
"""

from __future__ import annotations

import json
import os
import socket
import time
from pathlib import Path


class WriterLocked(RuntimeError):
    """Another live writer holds the lake's lease."""


class WriterLease:
    FILE = "_writer.lock"
    _depth: dict[str, int] = {}          # process-local reentrancy
    _heartbeats: dict[str, "threading.Event"] = {}   # renewal stop flags

    def __init__(self, lake_dir: str, owner: str = "writer",
                 ttl_s: float = 1800.0):
        self.path = str(Path(lake_dir) / self.FILE)
        self.owner = owner
        self.ttl_s = ttl_s

    # ------------------------------------------------------------- state

    def holder(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _is_stale(self) -> bool:
        try:
            age = time.time() - os.path.getmtime(self.path)
        except FileNotFoundError:
            return False
        h = self.holder()
        ttl = float(h.get("ttl_s", self.ttl_s)) if h else self.ttl_s
        return age > ttl

    def _held_by_me(self) -> bool:
        h = self.holder()
        return bool(h) and h.get("pid") == os.getpid() \
            and h.get("host") == socket.gethostname()

    # ----------------------------------------------------------- acquire

    def acquire(self) -> "WriterLease":
        if self._held_by_me():
            self._depth[self.path] = self._depth.get(self.path, 0) + 1
            return self
        Path(self.path).parent.mkdir(parents=True, exist_ok=True)
        for attempt in (0, 1):
            try:
                fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            except FileExistsError:
                if attempt == 0 and self._is_stale():
                    # expired holder: clear and retry; two racing waiters
                    # both unlink (idempotent) but O_EXCL lets one win
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                h = self.holder() or {}
                raise WriterLocked(
                    f"lake is being written by {h.get('owner', '?')} "
                    f"(pid {h.get('pid', '?')} on {h.get('host', '?')}, "
                    f"acquired {h.get('acquired_at', '?')}); if that writer "
                    f"crashed, the lease expires {self.ttl_s:.0f}s after its "
                    f"last renewal") from None
            with os.fdopen(fd, "w") as f:
                json.dump({"owner": self.owner, "pid": os.getpid(),
                           "host": socket.gethostname(),
                           "acquired_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                           "ttl_s": self.ttl_s}, f)
                f.flush()
                os.fsync(f.fileno())
            self._depth[self.path] = 1
            self._start_heartbeat()
            return self
        raise WriterLocked(f"could not acquire {self.path}")  # pragma: no cover

    def _start_heartbeat(self) -> None:
        """Renew the lease from a daemon thread every ttl/3 so a pass
        longer than the ttl never goes stale under a live holder — a
        second writer's stale-takeover must only ever fire on a CRASHED
        holder (the thread dies with the process, stopping renewals)."""
        import threading
        stop = threading.Event()
        self._heartbeats[self.path] = stop
        interval = max(self.ttl_s / 3.0, 1.0)

        def beat():
            while not stop.wait(interval):
                try:
                    self.renew()
                except OSError:
                    pass

        threading.Thread(target=beat, daemon=True,
                         name=f"writer-lease-{Path(self.path).parent.name}"
                         ).start()

    def renew(self) -> None:
        if self._held_by_me():
            os.utime(self.path)

    def release(self) -> None:
        d = self._depth.get(self.path, 0)
        if d > 1:
            self._depth[self.path] = d - 1
            return
        self._depth.pop(self.path, None)
        hb = self._heartbeats.pop(self.path, None)
        if hb is not None:
            hb.set()
        if self._held_by_me():
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass

    # ----------------------------------------------------- context mgmt

    def __enter__(self) -> "WriterLease":
        return self.acquire()

    def __exit__(self, *exc) -> bool:
        self.release()
        return False
