"""Worker registry + distributed dispatch.

Reference: single-job dispatch applies `class.function(args...)` per event
in an isolated Task (lib/flume/pipeline/event/worker.ex:25-102); bulk
dispatch applies one call per batch with args nested `[[args...]]` and
all-or-nothing success marking (lib/flume/pipeline/bulk_event/worker.ex:8-89).

Spark shape: claimed jobs are a DataFrame; dispatch is `mapInPandas`
(single mode) or `applyInPandas` grouped by class (bulk mode) — Arrow
batches in, per-jid result rows out.  Workers are plain Python callables
registered by class name; the registry closure ships to executors (in
production, workers live in an importable module on the executors'
PYTHONPATH and the registry just names them).
"""

from __future__ import annotations

import json
import threading
import time
import traceback
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from flume_spark.queue.schema import DISPATCH_RESULT_SCHEMA

# context propagation (reference stashes context in the process dictionary —
# lib/flume/pipeline/context.ex:1-14); we use a module global per executor
# worker process, readable by the running job via current_context().
# NB: dispatch closures are pickled by value, so they must set this through
# an explicit module import — a bare `global` would write to the closure's
# cloned globals, invisible to workers importing this module.
_CURRENT_CONTEXT: dict | list | None = None


def current_context() -> dict | list | None:
    return _CURRENT_CONTEXT


def _set_context(value) -> None:
    import flume_spark.queue.workers as W

    W._CURRENT_CONTEXT = value


def _as_dict(context) -> dict | None:
    """Arrow delivers MapType as a list of (k, v) tuples in pandas."""
    if context is None:
        return None
    if isinstance(context, dict):
        return context
    try:
        return dict(context)
    except (TypeError, ValueError):
        return None


def _resolve_worker(workers: dict, cls: str, fn_name: str):
    """class.function dispatch (worker.ex:81-87: apply(class, function, args)).

    Resolution order: an explicit "Cls.func" registration wins; otherwise the
    "Cls" registration is called directly for the default function
    ("perform") or via getattr for any other name (class-instance workers
    with methods).  An unknown combination raises KeyError, which the
    per-job isolation path converts into a failed job with the message —
    silently running the wrong routine is never an option.
    """
    key = f"{cls}.{fn_name}"
    if key in workers:
        return workers[key]
    obj = workers[cls]
    if fn_name == "perform":
        return obj
    attr = getattr(obj, fn_name, None)
    if callable(attr):
        return attr
    raise KeyError(f"no worker registered for {cls}.{fn_name}")


class WorkerRegistry:
    """class-name -> callable. Callables take positional args (single mode)
    or a list-of-args-lists (bulk mode, reference nesting [[args...]]).
    Register "Cls" for the default `perform` function or "Cls.func" for a
    named function (≙ the reference's apply(class, function, args))."""

    def __init__(self) -> None:
        self._workers: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable | None = None):
        if fn is None:

            def deco(f: Callable) -> Callable:
                self._workers[name] = f
                return f

            return deco
        self._workers[name] = fn
        return fn

    def get(self, name: str) -> Callable:
        return self._workers[name]

    def names(self) -> list[str]:
        return sorted(self._workers)


def _write_marker(marker_dir: str, jid: str) -> None:
    """Write the processed-jid idempotence marker from the EXECUTOR, at
    completion time — before the result row ever travels back to the driver.
    A crash anywhere after the worker's side effects (executor death, driver
    death mid-collect) therefore still leaves the marker, and the
    visibility-timeout redelivery skips the worker.  The only remaining
    window is between the user function returning and this rename — the
    minimum any non-transactional worker can achieve.  Atomic rename keeps
    concurrent readers from seeing partial files; marker_dir lives on the
    store's shared control path.
    """
    import os
    import uuid

    os.makedirs(marker_dir, exist_ok=True)
    tmp = os.path.join(marker_dir, f".{jid}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        f.write("true")
    os.rename(tmp, os.path.join(marker_dir, jid))


def _call_with_timeout(fn: Callable, args: list, timeout_s: float | None):
    """Bound the worker call's wall-clock time.

    Runs the call on a daemon thread and abandons it on timeout: the hung
    thread leaks (Python can't kill threads) but the dispatch loop moves on,
    so one stuck job delays its micro-batch by at most ``timeout_s`` — the
    semantics the reference gets from killing the worker Task process
    (lib/flume/pipeline/event/worker.ex timeout exits).  A pool context
    manager would block in shutdown(wait=True) until the hung call returned,
    making the timeout advisory only.
    """
    if timeout_s is None:
        return fn(*args)
    result: list = []

    def target() -> None:
        try:
            result.append(("ok", fn(*args)))
        except BaseException as exc:  # noqa: BLE001 — crosses the thread boundary
            result.append(("err", exc))

    t = threading.Thread(target=target, daemon=True, name="flume-worker-call")
    t.start()
    t.join(timeout_s)
    if not result:
        raise TimeoutError(f"worker exceeded {timeout_s}s")
    kind, val = result[0]
    if kind == "err":
        raise val
    return val


def dispatch_single(
    claimed: DataFrame,
    registry: WorkerRegistry,
    timeout_s: float | None = None,
    marker_dir: str | None = None,
) -> DataFrame:
    """Per-job dispatch with per-job crash isolation (one bad job never
    fails the batch — mirrors the rescue at pipeline/event/worker.ex:43-67
    and the `restart: :temporary` consumer isolation).  With `marker_dir`,
    each successful job writes its processed-jid marker executor-side at
    completion time (see `_write_marker`)."""
    workers = dict(registry._workers)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                started = time.perf_counter()
                err = None
                tb = None
                try:
                    fn = _resolve_worker(workers, row.c_class, row.function)
                    args = json.loads(row.args)
                    _set_context(_as_dict(row.context))
                    _call_with_timeout(fn, args, timeout_s)
                    if marker_dir is not None:
                        _write_marker(marker_dir, row.jid)
                except Exception as exc:  # noqa: BLE001 — isolation boundary
                    err = f"{type(exc).__name__}: {exc}"
                    tb = traceback.format_exc(limit=5)
                finally:
                    _set_context(None)
                out.append(
                    {
                        "jid": row.jid,
                        "ok": err is None,
                        "error_message": err,
                        "error_backtrace": tb,
                        "duration_ms": (time.perf_counter() - started) * 1e3,
                    }
                )
            yield pd.DataFrame(out)

    prepared = claimed.selectExpr(
        "jid", "class as c_class", "function", "args", "context"
    )
    return prepared.mapInPandas(run, schema=DISPATCH_RESULT_SCHEMA)


def dispatch_bulk(
    claimed: DataFrame,
    registry: WorkerRegistry,
    batch_size: int,
    timeout_s: float | None = None,
    marker_dir: str | None = None,
) -> DataFrame:
    """Bulk dispatch: group by class, chunk by batch_size, one call per
    chunk with args nested [[args_1, args_2, ...]] (bulk_event.ex:42,58-64);
    a chunk failure marks every job in the chunk failed (all-or-nothing,
    bulk_event/worker.ex:80-89).  With `marker_dir`, a successful chunk
    writes every member's processed-jid marker at completion time.

    Groups are (queue, class, function): reference batches are built inside
    ONE pipeline (producer_consumer.ex:51-61 groups a single queue's
    events), so jobs from two pipelines that share a worker class must
    never land in one all-or-nothing chunk — a poison job in queue A would
    fail queue B's jobs, and chunk durations would cross queues."""
    workers = dict(registry._workers)

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cls = pdf["c_class"].iloc[0]
        fn_name = pdf["function"].iloc[0]
        pdf = pdf.sort_values("jid", kind="stable")
        out = []
        for lo in range(0, len(pdf), batch_size):
            chunk = pdf.iloc[lo : lo + batch_size]
            started = time.perf_counter()
            err = None
            tb = None
            try:
                fn = _resolve_worker(workers, cls, fn_name)
                args_list = [json.loads(a) for a in chunk["args"]]
                contexts = [_as_dict(c) for c in chunk["context"] if c is not None]
                _set_context([c for c in contexts if c] or None)
                _call_with_timeout(fn, [args_list], timeout_s)
                if marker_dir is not None:
                    for jid in chunk["jid"]:
                        _write_marker(marker_dir, jid)
            except Exception as exc:  # noqa: BLE001 — isolation boundary
                err = f"{type(exc).__name__}: {exc}"
                tb = traceback.format_exc(limit=5)
            finally:
                _set_context(None)
            # amortize the one worker call over its chunk so summed per-job
            # durations equal real worker wall-clock (a chunk-duration per
            # row would inflate [:pipeline,:worker] by ~batch_size x)
            dur = (time.perf_counter() - started) * 1e3 / max(len(chunk), 1)
            for jid in chunk["jid"]:
                out.append(
                    {
                        "jid": jid,
                        "ok": err is None,
                        "error_message": err,
                        "error_backtrace": tb,
                        "duration_ms": dur,
                    }
                )
        return pd.DataFrame(out)

    prepared = claimed.selectExpr(
        "queue", "jid", "class as c_class", "function", "args", "context"
    )
    return prepared.groupBy("queue", "c_class", "function").applyInPandas(
        run_group, schema=DISPATCH_RESULT_SCHEMA
    )
