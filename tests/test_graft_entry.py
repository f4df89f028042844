"""Driver contract: dryrun_multichip runs the full sharded train step."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip(8) OK" in out


def test_entry_shapes():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 1000)
