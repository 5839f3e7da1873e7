"""Driver-contract tests: __graft_entry__.entry() compiles single-device and
dryrun_multichip() executes a sharded step on the 8-device virtual mesh."""

import jax
import pytest

pytestmark = pytest.mark.slow  # jits multi-network steps / fresh model shapes


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 32, 80, 1)
        assert float(jax.numpy.abs(out).max()) <= 1.0

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)

    def test_dryrun_multichip_2(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(2)
