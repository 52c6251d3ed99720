"""Progress/feedback channel — A17 (reference: CoreFeedback messages on a
multiprocessing queue rendered by a rich Live loop, cloud2sql/collect.py:
165-179 ``show_messages`` + 183-189; per-collector progress_done calls).

Spark re-expression, two layers:

- ``ProgressReporter`` — the message channel the pipeline itself feeds
  (per-source collect start/finish, per-table load counts, snapshot
  promote), printed as single lines to a stream (stderr by default; no
  TTY/rich dependency so it behaves in logs and CI).
- ``StageProgressPoller`` — a daemon thread over
  ``sc.statusTracker()`` that reports executor-side task progress for
  long Spark jobs (the information the reference cannot see because its
  collectors are opaque Python; here every load IS a Spark job). Emits
  only on change, so an idle driver prints nothing.
"""

from __future__ import annotations

import sys
import threading
import time
from typing import TextIO


class ProgressReporter:
    """Thread-safe single-line progress messages (the CoreFeedback shape:
    a context path + a message)."""

    def __init__(self, stream: TextIO | None = None, enabled: bool = True):
        self.stream = stream if stream is not None else sys.stderr
        self.enabled = enabled
        self._lock = threading.Lock()

    def progress(self, context: str, message: str) -> None:
        if not self.enabled:
            return
        with self._lock:
            print(f"[{context}] {message}", file=self.stream, flush=True)

    def progress_done(self, context: str, done: int, total: int) -> None:
        self.progress(context, f"{done}/{total} done")


class NullReporter(ProgressReporter):
    def __init__(self) -> None:
        super().__init__(enabled=False)


class StageProgressPoller:
    """Polls the Spark status tracker and reports per-stage task counts
    while jobs run (driver-side; bounded by poll interval, not data)."""

    def __init__(
        self,
        sc,
        reporter: ProgressReporter,
        interval: float = 1.0,
    ):
        self.sc = sc
        self.reporter = reporter
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        last: dict[int, tuple[int, int]] = {}
        while not self._stop.wait(self.interval):
            tracker = self.sc.statusTracker()
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info is None:
                    continue
                snap = (info.numCompletedTasks, info.numTasks)
                if last.get(sid) != snap:
                    last[sid] = snap
                    self.reporter.progress(
                        "spark", f"stage {sid}: {snap[0]}/{snap[1]} tasks"
                    )

    def __enter__(self) -> "StageProgressPoller":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1.0)
