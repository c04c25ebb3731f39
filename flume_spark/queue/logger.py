"""Pluggable logger behaviour — reference parity for lib/flume/logger.ex:1-59
and default_logger.ex:1-22 (round-3 verdict item 7).

The reference defines a user-implementable behaviour with
debug/info/warn/error(message, opts) callbacks, selected via config
(`logger: Flume.DefaultLogger`, config.ex:7) — a user porting a custom
Flume.Logger needs the same seam here: implement `FlumeLogger`'s four
methods, pass the instance as QueueManager(logger=...) or in the
from_config dict under "logger".

DefaultLogger mirrors default_logger.ex exactly: bridges to std `logging`
under the "flume_spark" logger, formats "<message> - <opts>" when opts is
non-empty, and gates debug lines behind `debug_log` (the reference's
Flume.Config.debug_log()).
"""

from __future__ import annotations

import logging
from typing import Protocol, runtime_checkable


@runtime_checkable
class FlumeLogger(Protocol):
    """The behaviour contract (logger.ex:7-10): four callbacks, each taking
    the message and a metadata dict (may be empty)."""

    def debug(self, message: str, opts: dict) -> None: ...

    def info(self, message: str, opts: dict) -> None: ...

    def warn(self, message: str, opts: dict) -> None: ...

    def error(self, message: str, opts: dict) -> None: ...


class DefaultLogger:
    """default_logger.ex semantics: plain message for empty opts,
    '<message> - <opts>' otherwise; debug suppressed unless debug_log."""

    def __init__(self, debug_log: bool = False):
        self._log = logging.getLogger("flume_spark")
        self.debug_log = debug_log

    @staticmethod
    def _fmt(message: str, opts: dict) -> str:
        return f"{message} - {opts}" if opts else message

    def debug(self, message: str, opts: dict) -> None:
        if self.debug_log:
            self._log.debug(self._fmt(message, opts))

    def info(self, message: str, opts: dict) -> None:
        self._log.info(self._fmt(message, opts))

    def warn(self, message: str, opts: dict) -> None:
        self._log.warning(self._fmt(message, opts))

    def error(self, message: str, opts: dict) -> None:
        self._log.error(self._fmt(message, opts))


class RecordingLogger:
    """Test double: records (level, message, opts) tuples — the analog of
    asserting on captured Logger output in the reference's tests."""

    def __init__(self):
        self.lines: list[tuple[str, str, dict]] = []

    def _rec(self, level: str, message: str, opts: dict) -> None:
        self.lines.append((level, message, opts))

    def debug(self, message: str, opts: dict) -> None:
        self._rec("debug", message, opts)

    def info(self, message: str, opts: dict) -> None:
        self._rec("info", message, opts)

    def warn(self, message: str, opts: dict) -> None:
        self._rec("warn", message, opts)

    def error(self, message: str, opts: dict) -> None:
        self._rec("error", message, opts)
