"""Single-writer lease with epoch fencing for dedup-on-ingest corpora.

Every correctness proof in the corpus-ingest family (exact / near-dup /
gated / semantic / payload, streaming/stream_ops.py) assumes ONE writer
at a time: the claim/replay protocol is crash-REPLAY safe for a single
writer, but two concurrent ingest streams on the same corpus_dir could
each probe the same sidecar state, miss each other's in-flight appends,
and land a silent duplicate — the exact wrongness class the family
exists to prevent. The reference is implicitly single-process (one CLI,
one JSON file — /root/reference/src/main.cpp:66-70 loads, mutates,
saves); at 100 TB with scheduled autopilot runs AND ingest streams,
accidental concurrency is a when, not an if.

The lease is a JSON file ``corpus_dir/_writer_lease.json`` (the "_"
prefix hides it from plain parquet reads, like every sidecar artifact):

    {"owner": <uuid>, "epoch": N, "pid": P, "host": H, "verb": V}

- **Acquire** is atomic: the lease body is written to a unique tmp file
  and ``os.link``ed into place — creation fails iff a lease already
  exists, with no window where a reader sees a partial body.
- **Conflict refuses loudly** with the remedy in the message (the
  family's refusal convention): if the holder is a live process this
  host can see, or any process on another host, the caller must either
  wait or pass ``force_lease=True``.
- **Crash recovery**: a holder whose recorded pid is provably dead on
  THIS host is reclaimed automatically (the common crashed-writer case
  costs the next writer nothing); a foreign-host or live-pid lease
  needs an explicit ``force_lease=True`` takeover — an operator
  decision, never a guess.
- **Epoch fencing**: every takeover bumps ``epoch``, so a writer that
  was taken over but is actually still alive is FENCED — its next
  per-batch verify (and its release) sees a lease it no longer owns and
  raises instead of writing. A fenced writer can never append another
  byte past the takeover point.
- **Reentrant in-process**: the stream verbs hold the lease around the
  whole drive while their per-batch apply functions re-acquire it, so
  one process nests freely (depth-counted); each reentrant acquire
  re-reads the lease file — that single file-stat per micro-batch IS
  the steady-state cost of the guard, and doubles as the mid-stream
  fencing check.

In-process threads share the held lease (the engine's own verbs are
coordinated by the depth counter); the lease guards CROSS-process and
cross-host writers, which is where the silent-duplicate hole was.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import uuid
from contextlib import contextmanager

__all__ = [
    "acquire_writer_lease",
    "release_writer_lease",
    "verify_writer_lease",
    "writer_lease",
    "holds_writer_lease",
    "WriterLeaseHeld",
    "LEASE_FILE",
]


class WriterLeaseHeld(ValueError):
    """Another writer holds the corpus's lease (the acquire-time
    CONFLICT, distinct from being fenced mid-write): callers that can
    legitimately defer — sidecar_report's heal, the autopilot's
    per-action executor — catch THIS type and skip, instead of string-
    matching a ValueError message or swallowing unrelated errors."""

LEASE_FILE = "_writer_lease.json"

# process-wide held-lease registry: abspath(corpus_dir) -> [lease, depth]
_HELD: dict[str, list] = {}
_LOCK = threading.Lock()


def _lease_path(corpus_dir: str) -> str:
    return os.path.join(os.path.abspath(corpus_dir), LEASE_FILE)


def _read_lease(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None
    except (OSError, ValueError):
        # unreadable or partial body: os.link-based creation makes this
        # impossible for a healthy lease, so treat it as corrupt — the
        # conflict message tells the operator how to clear it
        return {"owner": None, "epoch": 0, "pid": None,
                "host": None, "verb": "<corrupt lease file>"}


def _pid_dead_on_this_host(lease: dict) -> bool:
    """Provably dead only: same host AND os.kill(pid, 0) says no such
    process. Anything else (foreign host, live pid, permission denied)
    is treated as possibly-alive — takeover then needs force_lease."""
    if lease.get("host") != socket.gethostname():
        return False
    pid = lease.get("pid")
    if not isinstance(pid, int) or pid <= 0:
        return True  # corrupt pid on our host: nothing to fence
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # exists, owned by someone else


def _write_lease_atomic(path: str, lease: dict, replace: bool) -> None:
    tmp = f"{path}.{lease['owner']}.tmp"
    with open(tmp, "w") as f:
        json.dump(lease, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        if replace:
            os.replace(tmp, path)  # takeover: atomic last-writer-wins
        else:
            os.link(tmp, path)  # create: atomic, fails iff one exists
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def acquire_writer_lease(
    corpus_dir: str, verb: str, force: bool = False
) -> dict:
    """Take (or reentrantly re-take) the corpus's single-writer lease.

    Raises ValueError with the remedy when another writer holds it and
    neither the dead-pid auto-reclaim nor ``force`` applies. Returns the
    held lease dict."""
    path = _lease_path(corpus_dir)
    key = os.path.abspath(corpus_dir)
    with _LOCK:
        held = _HELD.get(key)
        if held is not None:
            # reentrant re-acquire: ONE file read doubles as the
            # mid-stream fencing check — a takeover since our outer
            # acquire must stop us before the next byte is written
            current = _read_lease(path)
            mine = held[0]
            if (
                current is None
                or current.get("owner") != mine["owner"]
                or current.get("epoch") != mine["epoch"]
            ):
                _HELD.pop(key, None)
                raise ValueError(
                    f"writer lease on {corpus_dir!r} was taken over "
                    f"(now {_describe(current)}; this writer held epoch "
                    f"{mine['epoch']}): this writer is FENCED — abandon "
                    "the corpus handle; re-acquire to resume"
                )
            held[1] += 1
            return mine

        os.makedirs(key, exist_ok=True)
        lease = {
            "owner": uuid.uuid4().hex,
            "epoch": 1,
            "pid": os.getpid(),
            "host": socket.gethostname(),
            "verb": str(verb),
        }
        # bounded create-read loop: another writer RELEASING between our
        # failed os.link and the follow-up read leaves no lease file —
        # that is a FREE corpus, so retry the create instead of refusing
        # with a nonsensical "another writer (no lease file)"
        for _attempt in range(5):
            try:
                _write_lease_atomic(path, lease, replace=False)
                break
            except FileExistsError:
                current = _read_lease(path)
                if current is None:
                    continue  # holder vanished mid-race: re-attempt
                if force or _pid_dead_on_this_host(current):
                    # epoch fencing: the bumped epoch invalidates every
                    # verify/release the old holder might still attempt
                    lease["epoch"] = int(current.get("epoch") or 0) + 1
                    _write_lease_atomic(path, lease, replace=True)
                    break
                raise WriterLeaseHeld(
                    f"another writer holds the lease on {corpus_dir!r} "
                    f"({_describe(current)}): concurrent writers on one "
                    "corpus silently double-append duplicates past the "
                    "dedup sidecar, so this call refuses. If that "
                    "writer crashed or is gone, re-run with "
                    "force_lease=True to take over (epoch "
                    f"{int(current.get('epoch') or 0) + 1} fences it "
                    "out); a dead pid on this host is reclaimed "
                    "automatically"
                ) from None
        else:
            raise WriterLeaseHeld(
                f"could not acquire the writer lease on {corpus_dir!r}: "
                "the lease file kept appearing and vanishing across 5 "
                "attempts (writers churning); retry, or force_lease=True"
            )
        _HELD[key] = [lease, 1]
        return lease


def verify_writer_lease(corpus_dir: str) -> dict:
    """Assert this process still owns the lease (owner + epoch match).
    Raises ValueError if not held in-process or fenced by a takeover."""
    key = os.path.abspath(corpus_dir)
    with _LOCK:
        held = _HELD.get(key)
        if held is None:
            raise ValueError(
                f"no writer lease held on {corpus_dir!r} in this "
                "process — acquire_writer_lease/writer_lease first"
            )
        current = _read_lease(_lease_path(corpus_dir))
        mine = held[0]
        if (
            current is None
            or current.get("owner") != mine["owner"]
            or current.get("epoch") != mine["epoch"]
        ):
            _HELD.pop(key, None)
            raise ValueError(
                f"writer lease on {corpus_dir!r} was taken over "
                f"(now {_describe(current)}; this writer held epoch "
                f"{mine['epoch']}): this writer is FENCED and must not "
                "write — abandon the corpus handle"
            )
        return mine


def release_writer_lease(corpus_dir: str) -> None:
    """Drop one level of the held lease; the outermost release removes
    the file — unless a takeover fenced us, in which case the new
    owner's lease is LEFT INTACT and this raises."""
    key = os.path.abspath(corpus_dir)
    path = _lease_path(corpus_dir)
    with _LOCK:
        held = _HELD.get(key)
        if held is None:
            return  # releasing an unheld lease is a no-op, not an error
        held[1] -= 1
        if held[1] > 0:
            return
        _HELD.pop(key, None)
        current = _read_lease(path)
        mine = held[0]
        if (
            current is not None
            and current.get("owner") == mine["owner"]
            and current.get("epoch") == mine["epoch"]
        ):
            os.unlink(path)
        elif current is not None:
            raise ValueError(
                f"writer lease on {corpus_dir!r} was taken over while "
                f"held (now {_describe(current)}; this writer held "
                f"epoch {mine['epoch']}): leaving the new owner's lease "
                "intact — this writer was fenced"
            )


def _describe(lease: dict | None) -> str:
    if lease is None:
        return "no lease file"
    return (
        f"verb={lease.get('verb')!r} pid={lease.get('pid')} "
        f"host={lease.get('host')!r} epoch={lease.get('epoch')}"
    )


@contextmanager
def writer_lease(corpus_dir: str, verb: str, force: bool = False):
    """``with writer_lease(corpus, 'ingest'):`` — acquire around a verb,
    always released (outermost release removes the file unless fenced)."""
    lease = acquire_writer_lease(corpus_dir, verb, force=force)
    try:
        yield lease
    finally:
        release_writer_lease(corpus_dir)


def holds_writer_lease(verb: str, dir_arg: str = "corpus_dir",
                       force_arg: str | None = None):
    """Decorator: run the wrapped verb under the corpus's writer lease.

    ``dir_arg`` names the parameter carrying the corpus dir;
    ``force_arg`` (when given) names the bool parameter whose True value
    authorizes a takeover (the verbs' ``force_lease=`` knob). Reentrant
    like writer_lease, so a decorated stream verb calling a decorated
    apply-batch function nests cleanly — the inner acquire costs one
    lease-file read, which IS the per-micro-batch fencing check."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            corpus_dir = bound.arguments[dir_arg]
            force = (
                bool(bound.arguments.get(force_arg)) if force_arg else False
            )
            with writer_lease(corpus_dir, verb, force=force):
                return fn(*args, **kwargs)

        return wrapper

    return deco
