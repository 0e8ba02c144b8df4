"""The driver's entry hooks must keep working across refactors.

Round 2 renamed an engine constructor and silently broke
``__graft_entry__.dryrun_multichip`` (MULTICHIP_r02 ok:false); these
tests run both hooks in-process so any future API drift fails the suite
instead of the driver.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as GE  # noqa: E402


def test_entry_compiles_and_runs():
    step, args = GE.entry()
    out = jax.jit(step).lower(*args).compile()(*args)
    jax.block_until_ready(out)


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8  # conftest forces the virtual mesh
    GE.dryrun_multichip(8)


def test_dryrun_matches_cli_engine_path():
    """dryrun must exercise the same class the CLI wires in."""
    import inspect

    src = inspect.getsource(GE.dryrun_multichip)
    assert "ShardedSpectrumEngine" in src
