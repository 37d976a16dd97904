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
  costs the next writer nothing). For a CRASHED REMOTE holder — whose
  pid this host can never probe — the corpus lease expires by
  heartbeat: every verb-held lease is refreshed (file mtime) every
  ``CORPUS_LEASE_HEARTBEAT_S`` seconds while the verb runs, and a
  lease whose last beat is older than ``CORPUS_LEASE_STALE_S`` is
  treated as crashed regardless of host (the install_dir_swap lock's
  TTL rule, promoted to the corpus lease in round 12 — before that a
  remote crash wedged the corpus until a human passed
  ``force_lease=True``). A LIVE remote holder can never be aged out:
  its beat keeps the mtime fresh, so staleness only ever fences a
  holder that truly stopped beating. Epoch fencing makes the expiry
  takeover safe even against a paused-not-dead holder that resumes.
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
    "CORPUS_LEASE_STALE_S",
    "CORPUS_LEASE_HEARTBEAT_S",
]

# Cross-host liveness for the corpus writer lease (every verb routed
# through holds_writer_lease): the holder beats the lease file's mtime
# every CORPUS_LEASE_HEARTBEAT_S seconds; a contender may reclaim a
# lease whose last beat is older than CORPUS_LEASE_STALE_S. The 6×
# margin between them means a holder must miss SIX consecutive beats —
# not one slow filesystem hiccup — before it can be aged out, and the
# epoch bump on the takeover fences it even if it was merely paused.
# These match install_dir_swap's proven TTL (layout.py): holds are
# minutes-long verbs, reclaim within the hour.
CORPUS_LEASE_STALE_S = 3600.0
CORPUS_LEASE_HEARTBEAT_S = 600.0


class WriterLeaseHeld(ValueError):
    """Another writer holds the corpus's lease (the acquire-time
    CONFLICT, distinct from being fenced mid-write): callers that can
    legitimately defer — sidecar_report's heal, the autopilot's
    per-action executor — catch THIS type and skip, instead of string-
    matching a ValueError message or swallowing unrelated errors."""

LEASE_FILE = "_writer_lease.json"

# process-wide held-lease registry: abspath(corpus_dir) -> [lease, depth]
_HELD: dict[str, list] = {}
# membership lock for the registries below ONLY — never held across disk
# I/O. Acquire/verify/release serialize on a PER-CORPUS lock instead: one
# slow stat on corpus A must not block every other stream's
# per-micro-batch fencing read on corpora B..N (max-review finding).
_LOCK = threading.Lock()
# NOTE: entries are one small Lock per distinct path per process
# lifetime and are deliberately never removed — dropping an entry while
# another thread still waits on the OLD lock object would let a new
# thread mint a NEW lock for the same key and both enter the per-key
# section concurrently, re-opening exactly the races the lock closes.
_KEY_LOCKS: dict[str, threading.Lock] = {}


def _key_lock(key: str) -> threading.Lock:
    with _LOCK:
        lk = _KEY_LOCKS.get(key)
        if lk is None:
            lk = _KEY_LOCKS[key] = threading.Lock()
        return lk


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


def _write_lease_atomic(path: str, lease: dict) -> None:
    """Create the lease file ATOMICALLY via hard link — fails with
    FileExistsError iff a lease is present. A fresh lease is only ever
    created through here (exactly one racing link succeeds); takeovers
    never create — they REPLACE atomically via the claim token's
    os.rename (_takeover_replace), so the file has no absence window."""
    tmp = f"{path}.{lease['owner']}.tmp"
    with open(tmp, "w") as f:
        json.dump(lease, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)  # atomic, exclusive
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


# how long a takeover/release claim token may sit before it is treated
# as a crashed claimer's leftover: tokens live for the microseconds
# between one exclusive link and one rename/unlink, so a minute-old one
# is debris no matter what host wrote it
_TOKEN_STALE_S = 60.0
_TOKEN_SUFFIX = ".takeover"


def _same_identity(current: dict | None, mine: dict | None) -> bool:
    """ONE copy of the lease-identity predicate (owner + epoch): six call
    sites previously re-implemented it with slight shape variation, and a
    future identity field missed at one site would silently weaken
    fencing exactly there (max-review finding)."""
    return (
        current is not None
        and mine is not None
        and current.get("owner") == mine.get("owner")
        and current.get("epoch") == mine.get("epoch")
    )


def _epoch(lease: dict | None) -> int:
    """The lease's epoch as an int, 0 for anything non-numeric — a
    hand-edited {"epoch": "five"} is valid JSON (so _read_lease does not
    return the corrupt sentinel) and a bare int() would crash the
    conflict path while FORMATTING its refusal message, hiding the
    force_lease remedy and the WriterLeaseHeld type from deferring
    callers (max-review finding)."""
    try:
        return int((lease or {}).get("epoch") or 0)
    except (TypeError, ValueError):
        return 0


def _claim_token(token: str, body: dict) -> bool:
    """Win the per-lease EXCLUSIVE claim token — the single serialization
    point every lease REMOVAL or REPLACEMENT must pass through. Exactly
    one racer's os.link succeeds; everyone else backs off (False) and
    re-evaluates the lease. A token left by a crashed claimer (dead pid
    on this host, or older than _TOKEN_STALE_S) is cleared through an
    exclusive rename-claim — a bare unlink-by-name would let two racers
    both "clear": the second unlink removes the first racer's FRESH
    token and both would believe they hold the serialization point
    (max-review finding); a rename of one source path has ONE winner."""
    for _ in range(3):
        try:
            _write_lease_atomic(token, body)
            return True
        except FileExistsError:
            holder = _read_lease(token)
            if _lease_age_s(token) > _TOKEN_STALE_S or (
                holder is not None and _pid_dead_on_this_host(holder)
            ):
                grave = f"{token}.cleared.{uuid.uuid4().hex}"
                try:
                    os.rename(token, grave)
                except FileNotFoundError:
                    continue  # another clearer won the rename: retry
                # verify the grave holds the SAME body we judged stale:
                # a racer may have cleared + re-linked its FRESH token
                # between our read and our rename, and the age/dead-pid
                # judgment above was made on the stale read — removing
                # the fresh token would hand two racers the "exclusive"
                # point (r11 fifth-review finding). A mismatched body is
                # restored; if a third racer linked into the microsecond
                # hole, the displaced claimer self-aborts at its own
                # pre-rename ownership check.
                got = _read_lease(grave)
                if holder is None or got is None or (
                    got.get("owner") != holder.get("owner")
                ):
                    try:
                        os.link(grave, token)
                    except FileExistsError:
                        pass
                os.unlink(grave)
                continue
            return False
    return False


def _takeover_replace(path: str, expect: dict, new_lease: dict) -> bool:
    """Install ``new_lease`` over ``expect`` ATOMICALLY: the new body is
    written into the claim token and os.rename'd over the lease file, so
    the lease NEVER disappears mid-takeover. (The previous remove-then-
    recreate opened a hole: a fresh acquirer could link its own lease
    into the gap, the remover's restore would then silently drop a LIVE
    holder's file, and two writers held the lease at once — the r11
    third-review finding.) Identity is re-verified under the token:
    if the lease is no longer ``expect``, someone else already won and
    this takeover aborts."""
    token = path + _TOKEN_SUFFIX
    if not _claim_token(token, new_lease):
        return False
    renamed = False
    try:
        if not _same_identity(_read_lease(path), expect):
            return False  # changed hands since our read: re-evaluate
        # our token could have been staleness-cleared while we stalled
        # past _TOKEN_STALE_S and re-claimed by another racer — renaming
        # THEIR token over the lease would install a foreign body while
        # we report success (max-review finding). Re-verify ownership
        # immediately before the rename; the residual window is the few
        # microseconds between this read and the rename (it requires a
        # >60 s stall landing exactly inside it), and a writer misled by
        # it is still caught by the per-micro-batch reentrant fencing
        # verify before its next batch lands.
        tok = _read_lease(token)
        if tok is None or tok.get("owner") != new_lease.get("owner"):
            return False  # token lost to a staleness-clear: we lost
        try:
            os.rename(token, path)  # atomic replace — no absence window
        except FileNotFoundError:
            return False  # cleared between the read and the rename
        renamed = True
        return True
    finally:
        if not renamed:
            # abort path only, and only OUR token: after a clear+reclaim
            # (or a successful rename) the name may hold someone else's
            # fresh token — unlinking it would destroy their exclusivity
            tok = _read_lease(token)
            if tok is not None and tok.get("owner") == new_lease.get("owner"):
                try:
                    os.unlink(token)
                except FileNotFoundError:
                    pass


def _remove_under_token(path: str, mine: dict) -> bool:
    """Remove our own lease file, serialized through the claim token so
    the verify-then-unlink can never race a takeover's rename-replace
    (unlinking the NEW owner's file). Returns True iff our lease was
    removed; False means a takeover won the token or already replaced
    us — the new owner's lease is left intact either way."""
    token = path + _TOKEN_SUFFIX
    if not _claim_token(token, mine):
        return False  # a takeover is mid-flight on this very lease
    try:
        if _same_identity(_read_lease(path), mine):
            os.unlink(path)
            return True
        return False
    finally:
        # only OUR token (same hazard as _takeover_replace's abort path:
        # a staleness-clear + reclaim may have put someone else's fresh
        # token at this name while we stalled)
        tok = _read_lease(token)
        if tok is not None and tok.get("owner") == mine.get("owner"):
            try:
                os.unlink(token)
            except FileNotFoundError:
                pass


def _lease_age_s(path: str) -> float:
    try:
        import time

        return max(0.0, time.time() - os.stat(path).st_mtime)
    except OSError:
        return 0.0


def acquire_writer_lease(
    corpus_dir: str, verb: str, force: bool = False,
    stale_after_s: float | None = None,
) -> dict:
    """Take (or reentrantly re-take) the corpus's single-writer lease.
    Returns the held lease dict (see _acquire_with_depth for the variant
    writer_lease uses to learn the post-acquire depth atomically)."""
    return _acquire_with_depth(
        corpus_dir, verb, force=force, stale_after_s=stale_after_s
    )[0]


def _acquire_with_depth(
    corpus_dir: str, verb: str, force: bool = False,
    stale_after_s: float | None = None,
) -> tuple[dict, int]:
    """Take (or reentrantly re-take) the corpus's single-writer lease,
    returning ``(lease, post_acquire_depth)`` — the depth is computed
    UNDER the per-key lock, so "am I the outermost hold?" is decided
    atomically with the acquire itself. (Re-querying _held_depth after
    acquire raced a concurrent first-acquire: both threads could see
    depth 2 and NO heartbeat thread would ever start, leaving a live
    multi-hour hold TTL-reclaimable — ADVICE r12.)

    Raises WriterLeaseHeld with the remedy when another writer holds it
    and none of the takeover rules apply: ``force``, the dead-pid
    auto-reclaim (same host, pid provably gone), or ``stale_after_s``
    (a lease file whose mtime — refreshed by the holder's heartbeat,
    see writer_lease — is OLDER than this many seconds is treated as
    crashed regardless of host). The staleness rule serves two shapes
    of caller: locks guarding operations with a known small duration
    (install_dir_swap's directory rename, the meta installs), and —
    paired with a heartbeat — arbitrarily long verb holds, where a
    foreign-host crash would otherwise wedge the corpus behind a
    force_lease only an operator can pass. Returns the held lease
    dict."""
    path = _lease_path(corpus_dir)
    key = os.path.abspath(corpus_dir)
    with _key_lock(key):
        held = _HELD.get(key)
        if held is not None:
            # reentrant re-acquire: ONE file read doubles as the
            # mid-stream fencing check — a takeover since our outer
            # acquire must stop us before the next byte is written
            current = _read_lease(path)
            mine = held[0]
            if not _same_identity(current, mine):
                _HELD.pop(key, None)
                raise ValueError(
                    f"writer lease on {corpus_dir!r} was taken over "
                    f"(now {_describe(current)}; this writer held epoch "
                    f"{mine['epoch']}): this writer is FENCED — abandon "
                    "the corpus handle; re-acquire to resume"
                )
            held[1] += 1
            return mine, held[1]

        os.makedirs(key, exist_ok=True)
        lease = {
            "owner": uuid.uuid4().hex,
            "epoch": 1,
            "pid": os.getpid(),
            "host": socket.gethostname(),
            "verb": str(verb),
        }
        # bounded create-claim loop. Two subtleties (r11 review):
        # (a) a holder RELEASING between our failed link and the
        #     follow-up read leaves no lease file — a FREE corpus, so
        #     retry the create instead of refusing nonsensically;
        # (b) takeover is an ATOMIC rename-replace serialized through
        #     the exclusive claim token (_takeover_replace): two racers
        #     both seeing a dead lease cannot both win, and the lease
        #     file never has an absence window a third acquirer could
        #     slip a fresh lease into (r11 third-review finding).
        for _attempt in range(5):
            try:
                _write_lease_atomic(path, lease)
                break
            except FileExistsError:
                current = _read_lease(path)
                if current is None:
                    continue  # holder vanished mid-race: re-attempt
                stale = (
                    stale_after_s is not None
                    and _lease_age_s(path) > float(stale_after_s)
                )
                if force or stale or _pid_dead_on_this_host(current):
                    # epoch fencing: the bumped epoch invalidates every
                    # verify/release the old holder might still attempt
                    lease["epoch"] = _epoch(current) + 1
                    if _takeover_replace(path, current, lease):
                        break  # our lease is installed atomically
                    continue  # lost the token race: re-evaluate
                expiry = (
                    f", and a lease {float(stale_after_s):.0f}s past its "
                    "last heartbeat is reclaimed automatically (this one "
                    f"last beat {_lease_age_s(path):.0f}s ago)"
                    if stale_after_s is not None
                    else ""
                )
                raise WriterLeaseHeld(
                    f"another writer holds the lease on {corpus_dir!r} "
                    f"({_describe(current)}): concurrent writers on one "
                    "corpus silently double-append duplicates past the "
                    "dedup sidecar, so this call refuses. If that "
                    "writer crashed or is gone, re-run with "
                    "force_lease=True to take over (epoch "
                    f"{_epoch(current) + 1} fences it "
                    "out); a dead pid on this host is reclaimed "
                    f"automatically{expiry}"
                ) from None
        else:
            raise WriterLeaseHeld(
                f"could not acquire the writer lease on {corpus_dir!r}: "
                "the lease file kept appearing and vanishing across 5 "
                "attempts (writers churning); retry, or force_lease=True"
            )
        _HELD[key] = [lease, 1]
        return lease, 1


def verify_writer_lease(corpus_dir: str) -> dict:
    """Assert this process still owns the lease (owner + epoch match).
    Raises ValueError if not held in-process or fenced by a takeover."""
    key = os.path.abspath(corpus_dir)
    with _key_lock(key):
        held = _HELD.get(key)
        if held is None:
            raise ValueError(
                f"no writer lease held on {corpus_dir!r} in this "
                "process — acquire_writer_lease/writer_lease first"
            )
        current = _read_lease(_lease_path(corpus_dir))
        mine = held[0]
        if not _same_identity(current, mine):
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
    with _key_lock(key):
        held = _HELD.get(key)
        if held is None:
            return  # releasing an unheld lease is a no-op, not an error
        held[1] -= 1
        if held[1] > 0:
            return
        _HELD.pop(key, None)
        current = _read_lease(path)
        mine = held[0]
        if _same_identity(current, mine):
            # removal is serialized through the claim token: a takeover
            # landing between our read and the unlink holds (or will
            # hold) the token, so we either remove OUR file under the
            # token or back off and leave the new owner's lease intact —
            # never unlink a lease that just changed hands (r11 review)
            if not _remove_under_token(path, mine):
                # the token is held. Usually a takeover mid-flight that
                # replaces our file momentarily — but a CRASHED claimer's
                # token would otherwise orphan a live-pid lease file that
                # wedges the corpus until this process exits (max-review
                # finding): retry briefly (dead-pid token clearing runs
                # inside _claim_token), then refuse LOUDLY with the
                # remedy instead of silently leaving the wedge.
                import time as _time

                removed = False
                for _ in range(4):
                    _time.sleep(0.05)
                    current = _read_lease(path)
                    if not _same_identity(current, mine):
                        # the takeover landed mid-retry: same situation
                        # as a takeover landing before the release began
                        # — raise the SAME loud fenced signal (silently
                        # returning here would make the race-with-my-
                        # final-batch warning nondeterministic, r11
                        # fifth-review finding)
                        raise ValueError(
                            f"writer lease on {corpus_dir!r} was taken "
                            f"over while held (now {_describe(current)}; "
                            f"this writer held epoch {mine['epoch']}): "
                            "leaving the new owner's lease intact — "
                            "this writer was fenced"
                        )
                    if _remove_under_token(path, mine):
                        removed = True
                        break
                if not removed:
                    # the wedge stands and WE still own the lease: put
                    # the registry entry back so the owner can retry the
                    # release after clearing the token (popping first
                    # would lock the owner out of its own lease — release
                    # a no-op, re-acquire refusing against its own live
                    # pid, r11 fifth-review finding)
                    held[1] = 1
                    _HELD[key] = held
                    raise ValueError(
                        f"could not release the writer lease on "
                        f"{corpus_dir!r}: the takeover claim token "
                        f"({path + _TOKEN_SUFFIX}) stayed held through "
                        "retries while the lease file still names this "
                        "writer — if the token's claimer crashed, delete "
                        "the token file and release again; the lease "
                        "itself self-clears via dead-pid reclaim once "
                        "this process exits"
                    )
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


def _held_depth(corpus_dir: str) -> int:
    """Reentrancy depth of this process's hold on the corpus lease (0 =
    not held)."""
    key = os.path.abspath(corpus_dir)
    with _key_lock(key):
        held = _HELD.get(key)
        return held[1] if held else 0


@contextmanager
def writer_lease(corpus_dir: str, verb: str, force: bool = False,
                 stale_after_s: float | None = None,
                 heartbeat_s: float | None = None):
    """``with writer_lease(corpus, 'ingest'):`` — acquire around a verb,
    always released (outermost release removes the file unless fenced).

    ``heartbeat_s`` keeps a LONG-held lease visibly alive: a daemon
    thread refreshes the lease file's mtime every ``heartbeat_s``
    seconds while the body runs, so callers that also pass
    ``stale_after_s`` (install_dir_swap's sibling lock, the layout gc)
    only ever age out a holder that truly stopped beating — without it,
    a guarded region longer than the staleness threshold (a multi-hour
    artifact write at 100 TB) would get its lock stolen and its tmp dir
    deleted MID-WRITE by a concurrent swap or gc (r11 third-review
    finding). The beat stops touching the file the moment a takeover
    changes the owner/epoch — a fenced writer must not freshen the new
    owner's lease."""
    lease, depth = _acquire_with_depth(
        corpus_dir, verb, force=force, stale_after_s=stale_after_s
    )
    stop = None
    # the beat runs once per OUTERMOST hold: a reentrant inner acquire
    # (the per-micro-batch apply under a stream-long outer hold) rides
    # the outer beat instead of minting a thread per batch. Outermost-
    # ness is the depth RETURNED by the acquire (computed under the
    # per-key lock) — re-querying _held_depth here raced a concurrent
    # first-acquire into a never-beaten hold (ADVICE r12).
    if heartbeat_s and depth == 1:
        path = _lease_path(corpus_dir)
        stop = threading.Event()

        def _beat() -> None:
            # Resilient by design (ADVICE r12): a beat that dies on ONE
            # transient hiccup leaves a live multi-hour holder silently
            # un-beaten and TTL-reclaimable — the two-concurrent-writers
            # class the lease exists to prevent. So: a failed utime is
            # retried next tick, a transient read failure (_read_lease's
            # corrupt sentinel, owner=None) is retried next tick, and
            # the beat stops only on a CONFIRMED identity change — a
            # re-read still showing a real different owner/epoch
            # (takeover) or a confirmed-missing file (released/cleared;
            # creation is link-atomic, so absence is a definite answer,
            # not a partial write).
            #
            # Known one-beat TOCTOU window, accepted and documented: a
            # takeover landing between the identity check and os.utime
            # means the fenced old holder freshens the NEW owner's file
            # mtime ONCE. Harmless — the new owner is alive and beating
            # (the freshened mtime is never staler than its own next
            # beat), and this beat stops at its next tick's check.
            while not stop.wait(float(heartbeat_s)):
                current = _read_lease(path)
                if not _same_identity(current, lease):
                    if current is not None and current.get("owner") is None:
                        continue  # corrupt-read sentinel: transient, retry
                    current = _read_lease(path)  # confirm before fencing
                    if not _same_identity(current, lease):
                        if current is not None and current.get("owner") is None:
                            continue  # still unreadable: retry next tick
                        return  # confirmed takeover/removal: stop touching
                try:
                    os.utime(path)
                except OSError:
                    continue  # transient (e.g. NFS hiccup): retry next tick

        threading.Thread(target=_beat, daemon=True).start()
    try:
        yield lease
    finally:
        if stop is not None:
            stop.set()
        release_writer_lease(corpus_dir)


def holds_writer_lease(verb: str, dir_arg: str = "corpus_dir",
                       force_arg: str | None = None,
                       stale_after_s: float | None = CORPUS_LEASE_STALE_S,
                       heartbeat_s: float | None = CORPUS_LEASE_HEARTBEAT_S):
    """Decorator: run the wrapped verb under the corpus's writer lease.

    ``dir_arg`` names the parameter carrying the corpus dir;
    ``force_arg`` (when given) names the bool parameter whose True value
    authorizes a takeover (the verbs' ``force_lease=`` knob). Reentrant
    like writer_lease, so a decorated stream verb calling a decorated
    apply-batch function nests cleanly — the inner acquire costs one
    lease-file read, which IS the per-micro-batch fencing check.

    Cross-host liveness (round 12): every decorated hold heartbeats the
    lease file every ``heartbeat_s`` seconds (outermost hold only — the
    nested per-batch acquires ride the stream-long outer beat), and a
    contender's acquire treats a lease ``stale_after_s`` past its last
    beat as crashed regardless of host. A crashed REMOTE writer is
    therefore reclaimable within the hour without ``force_lease=True``
    — previously its pid was unprobeable from this host and the corpus
    wedged until an operator forced it (r11 verdict item 2); a live
    remote writer keeps beating and can never be aged out, and the
    takeover's epoch bump fences a paused-not-dead holder that
    resumes."""
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
            with writer_lease(corpus_dir, verb, force=force,
                              stale_after_s=stale_after_s,
                              heartbeat_s=heartbeat_s):
                return fn(*args, **kwargs)

        return wrapper

    return deco
