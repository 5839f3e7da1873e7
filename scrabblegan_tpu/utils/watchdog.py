"""In-process stall watchdog for remote-backend training runs.

The remote-TPU tunnel backend can lose a dispatched result, leaving the host
blocked FOREVER inside ``jax.device_get`` (C++ wait with the GIL released;
observed stacks: ``array.py:_value`` under ``flush_pending`` / epoch eval).
No Python-level recovery is possible once the wait has started, so the only
safe self-heal is a supervised process exit: an outer supervisor
(``scripts/run_campaign.sh``, or any retry wrapper watching for exit code
``STALL_EXIT_CODE``) restarts the run, which resumes from its last
checkpoint (``io.ckpt_every``).

The reference has no failure-recovery story at all (SURVEY.md §5: a mid-run
crash loses everything); this plus Orbax resume is the replacement.

Usage:
    wd = StallWatchdog(timeout_s=900)
    wd.start()
    ...
    wd.beat()   # after every unit of observable progress
    ...
    wd.stop()

``timeout_s`` must exceed the slowest LEGITIMATE blocking operation of the
run — or the caller must announce known-long blocks with ``grace(s)`` (a
one-shot window used before the first dispatch of every new batch shape,
where a cold XLA compile can block for 15+ minutes on the remote compile
service) — or the watchdog will shoot a healthy run (observed: a cold
padded-step compile killed at 900s three times in a row).

``touch_file`` (optional) is touched on every poll while the watchdog still
considers the process healthy, so a FILE-ACTIVITY supervisor (the outer
``run_campaign.sh`` loop) can keep a tight window without false-killing
compile-bound phases: liveness = the heartbeat mtime, progress = this
watchdog, hard interpreter death = process exit.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

STALL_EXIT_CODE = 86


class StallWatchdog:
    def __init__(self, timeout_s: float, label: str = "train",
                 touch_file: str | None = None):
        if timeout_s <= 0:
            raise ValueError("timeout_s must be positive")
        self.timeout_s = float(timeout_s)
        self.label = label
        self.touch_file = touch_file
        self._last_beat = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self) -> None:
        self._last_beat = time.monotonic()

    def grace(self, seconds: float) -> None:
        """Announce an expected progress-free block (cold compile, multi-GB
        checkpoint fetch): firing is deferred as if a beat were going to
        arrive ``seconds`` from now, i.e. the next possible fire time is
        ``now + seconds + timeout_s``. A real beat afterwards returns to
        normal cadence."""
        self._last_beat = max(self._last_beat,
                              time.monotonic() + float(seconds))

    def _touch(self) -> None:
        if not self.touch_file:
            return
        try:
            with open(self.touch_file, "a"):
                pass
            os.utime(self.touch_file, None)
        except OSError:
            pass

    def start(self) -> "StallWatchdog":
        self.beat()
        self._thread = threading.Thread(
            target=self._run, name=f"stall-watchdog-{self.label}", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        poll = max(0.05, min(5.0, self.timeout_s / 4))
        self._touch()
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last_beat
            if idle <= self.timeout_s:
                # touch only on healthy polls, so the heartbeat mtime
                # post-mortems as "last time the watchdog saw progress"
                self._touch()
            else:
                sys.stderr.write(
                    f"\n[watchdog:{self.label}] no progress for {idle:.0f}s "
                    f"(> {self.timeout_s:.0f}s): assuming a lost tunnel "
                    f"dispatch; dumping stacks and exiting "
                    f"{STALL_EXIT_CODE} for supervised retry\n")
                sys.stderr.flush()
                faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
                sys.stderr.flush()
                os._exit(STALL_EXIT_CODE)
