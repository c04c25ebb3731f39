"""Shared maintenance plumbing for the streaming ingestors' persisted
parquet state (LmIngestor counts, PhashIngestor / FrameIngestor band
indexes): ledger-marker acks, partition listing, and the crash-safe
directory fold.

The fold problem: compaction merges every `ingest_batch=N` partition of a
state directory into one base partition.  A naive in-place rewrite has a
destruction window — `mode("overwrite")` clears the target before the new
files commit, and delete-then-write loses everything if the write never
happens.  For ADDITIVE state (LM counts) the reverse order is just as
wrong: base-written-then-crash-before-deletes double-counts every folded
partition.  `atomic_fold_swap` closes both windows with the rename
protocol below; `recover_fold` heals the one remaining window at the next
construction or maintenance call.

Protocol (POSIX dir renames are atomic):
  1. materialize the merged frame (caller localCheckpoints it eagerly —
     the source dirs can vanish after this point)
  2. write it to `<dir>.foldtmp` — OUTSIDE the read path, so a crash here
     leaves live state untouched (orphan tmp GC'd on the next call)
  3. rename `<dir>` -> `<dir>.foldold`   (atomic)
  4. rename `<dir>.foldtmp` -> `<dir>`   (atomic)
  5. delete `<dir>.foldold`
A crash between 3 and 4 is the ONLY window where the live dir is missing;
`recover_fold` detects it (live missing + .foldold present) and renames
the old state back — nothing is ever lost, at worst a fold is undone.
A crash after 4 leaves an orphan .foldold which recover_fold deletes
(the live dir already holds the folded state).

Concurrency (round-13 ADVICE): the fold window is guarded by an O_EXCL
pid-sentinel lockfile `<dir>.foldlock`.  Without it, a second ingestor
instance (or any concurrent construction over the same state dirs)
racing an in-flight swap could rmtree the swap's staging dir or "heal"
its mid-rename state destructively.  `atomic_fold_swap` and
`recover_fold` both take the lock; a LIVE lock (owner pid still
running) raises `FoldLockHeld` — construct the second instance after
the maintenance window, never during.  A STALE lock (owner pid gone —
a crash while folding) is removed and recovery proceeds.  The sentinel
is pid-liveness-based and therefore single-host; on a shared
filesystem it degrades to best-effort and the single-writer
maintenance-window contract is the real guarantee.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

BASE_PARTITION = -9  # folded state lives here (the sem-carry convention)


class FoldLockHeld(RuntimeError):
    """Another live process holds `<dir>.foldlock` — a fold or recovery
    is in flight over this state directory."""


def _lock_is_stale(lock: str) -> bool:
    """True when the sentinel's owner pid is gone (crashed mid-fold) or
    the sentinel is unreadable/empty (owner crashed between creating and
    stamping it — it can hold no fold work yet either way)."""
    try:
        with open(lock) as fh:
            pid = int(fh.read().strip() or "0")
    except (OSError, ValueError):
        return True
    if pid <= 0:
        return True
    try:
        os.kill(pid, 0)  # existence probe only — signal 0 delivers nothing
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # alive under another uid


def _acquire_fold_lock(d: str) -> str:
    """Create `<dir>.foldlock` with O_EXCL, stamping the owner pid.
    Raises FoldLockHeld when a live owner exists; reclaims stale locks
    (at most one retry — a second loss means a live contender won the
    reclaim race, which IS the held case)."""
    lock = d + ".foldlock"
    for _ in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            if not _lock_is_stale(lock):
                raise FoldLockHeld(
                    f"fold in flight on {d} (live {lock}) — one maintenance "
                    "writer at a time; retry after the window closes"
                ) from None
            try:
                os.unlink(lock)  # stale: owner is gone, reclaim
            except FileNotFoundError:
                pass  # another reclaimer got there first; retry O_EXCL
            continue
        with os.fdopen(fd, "w") as fh:
            fh.write(f"{os.getpid()}\n")
        return lock
    raise FoldLockHeld(f"could not reclaim contended {lock}")


def _release_fold_lock(lock: str) -> None:
    try:
        os.unlink(lock)
    except FileNotFoundError:
        pass


def batch_acked(ledger_dir: str, batch_id: int) -> bool:
    """Ledger marker file ONLY — the marker is committed strictly after a
    `_process`'s state writes, so it is the one ack that cannot lie
    across the crash window (an in-memory ack set defeats quiesce guards
    when the marker write itself fails; round-11 ADVICE)."""
    return os.path.exists(os.path.join(ledger_dir, f"batch-{batch_id}.done"))


def ingest_partitions(d: str) -> list[int]:
    """Batch ids of the `ingest_batch=` partitions under `d`."""
    if not os.path.isdir(d):
        return []
    return [
        int(p.split("=", 1)[1])
        for p in os.listdir(d)
        if p.startswith("ingest_batch=")
    ]


def quiesce_or_raise(parts: list[int], ledger_dir: str, what: str) -> None:
    """Raise unless every non-base partition is ledger-acknowledged —
    folding a written-but-unacked batch corrupts its ledger replay
    (double-counted additive state; self-matching probe rows)."""
    stale = sorted(
        b for b in parts if b != BASE_PARTITION and not batch_acked(ledger_dir, b)
    )
    if stale:
        raise RuntimeError(
            f"{what} on a non-quiesced stream: batch(es) {stale} are "
            "written but unacknowledged — let the stream drain (or "
            "replay) before compacting"
        )


def _recover_fold_locked(d: str) -> None:
    """Recovery body — caller holds `<dir>.foldlock`."""
    old, tmp = d + ".foldold", d + ".foldtmp"
    live = os.listdir(d) if os.path.isdir(d) else None
    if not live and os.path.isdir(old):
        if live is not None:
            os.rmdir(d)  # empty recreation; the old state is authoritative
        os.rename(old, d)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def recover_fold(d: str) -> None:
    """Heal the rename-window crash of `atomic_fold_swap` (call at
    construction and at the head of every fold): restore `<dir>.foldold`
    if the live dir is missing — or EMPTY, since a constructor's
    makedirs may have already recreated the bare directory before the
    healer runs — then GC orphan staging/old dirs.  Runs under the fold
    lock: raises FoldLockHeld instead of destroying an in-flight swap's
    staging when another live process is mid-fold (round-13 ADVICE)."""
    lock = _acquire_fold_lock(d)
    try:
        _recover_fold_locked(d)
    finally:
        _release_fold_lock(lock)


def atomic_fold_swap(d: str, write_merged: Callable[[str], None]) -> None:
    """Replace directory `d` with a folded version crash-safely (module
    docstring protocol).  `write_merged(tmp_dir)` must write the complete
    folded state under `tmp_dir` from an ALREADY-MATERIALIZED frame
    (localCheckpoint before calling — the live dir is renamed away in
    step 3, so lazy plans reading it would fail).  The whole window runs
    under the O_EXCL fold lock; a concurrent fold/recovery over the same
    dir raises FoldLockHeld instead of racing."""
    lock = _acquire_fold_lock(d)
    try:
        _recover_fold_locked(d)
        old, tmp = d + ".foldold", d + ".foldtmp"
        write_merged(tmp)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        _release_fold_lock(lock)


def with_auto_compact(
    inner: Callable, every: int | None, compact: Callable[[], int]
) -> Callable:
    """Wrap a ledger-guarded foreachBatch writer with the maintenance
    cadence: run `compact()` right after every `every`-th batch's marker
    commit — the stream is quiesced by construction at that instant
    (foreachBatch is sequential per query), so the fold can never hit the
    quiesce guard."""

    def process(batch_df, batch_id: int) -> None:
        inner(batch_df, batch_id)
        if every and (batch_id + 1) % every == 0:
            compact()

    return process
