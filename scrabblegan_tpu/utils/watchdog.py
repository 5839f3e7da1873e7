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
run — a cold XLA compile (minutes on the remote compile service) or a
full-state checkpoint fetch (multi-GB D2H over the tunnel) — or the watchdog
will shoot a healthy run.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

STALL_EXIT_CODE = 86


class StallWatchdog:
    def __init__(self, timeout_s: float, label: str = "train"):
        if timeout_s <= 0:
            raise ValueError("timeout_s must be positive")
        self.timeout_s = float(timeout_s)
        self.label = label
        self._last_beat = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self) -> None:
        self._last_beat = time.monotonic()

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
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last_beat
            if idle > self.timeout_s:
                sys.stderr.write(
                    f"\n[watchdog:{self.label}] no progress for {idle:.0f}s "
                    f"(> {self.timeout_s:.0f}s): assuming a lost tunnel "
                    f"dispatch; dumping stacks and exiting "
                    f"{STALL_EXIT_CODE} for supervised retry\n")
                sys.stderr.flush()
                faulthandler.dump_traceback(file=sys.stderr, all_threads=True)
                sys.stderr.flush()
                os._exit(STALL_EXIT_CODE)
