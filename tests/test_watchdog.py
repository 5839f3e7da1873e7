"""Stall watchdog (utils/watchdog.py): the self-heal for lost tunnel
dispatches that block jax.device_get forever (SURVEY.md §5 failure
recovery — the reference has none)."""

import subprocess
import sys
import time

from scrabblegan_tpu.utils.watchdog import STALL_EXIT_CODE, StallWatchdog


class TestStallWatchdog:
    def test_beats_keep_it_alive_and_stop_works(self):
        wd = StallWatchdog(timeout_s=0.4).start()
        for _ in range(4):
            time.sleep(0.15)
            wd.beat()  # stays under the timeout only thanks to the beats
        wd.stop()
        time.sleep(0.6)  # would have fired by now if stop() didn't take

    def test_stall_exits_process_with_code_86(self):
        # os._exit can't be tested in-process; run the stall in a subprocess
        code = (
            "import time\n"
            "from scrabblegan_tpu.utils.watchdog import StallWatchdog\n"
            "StallWatchdog(timeout_s=0.3).start()\n"
            "time.sleep(10)\n"
        )
        proc = subprocess.run([sys.executable, "-c", code], timeout=30,
                              capture_output=True, text=True)
        assert proc.returncode == STALL_EXIT_CODE
        assert "no progress" in proc.stderr

    def test_rejects_nonpositive_timeout(self):
        import pytest

        with pytest.raises(ValueError):
            StallWatchdog(timeout_s=0)

    def test_trainer_wires_it(self):
        """config key exists and Trainer.train reads it (smoke via source —
        the full loop is exercised by slow tests)."""
        from scrabblegan_tpu.config import IOConfig

        assert IOConfig().stall_timeout_s == 0.0
        import inspect

        from scrabblegan_tpu.train import loop

        src = inspect.getsource(loop.Trainer.train)
        assert "stall_timeout_s" in src and "watchdog.beat()" in src
