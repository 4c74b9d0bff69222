"""Driver-contract smoke tests: entry() jit-compiles and dryrun_multichip
compiles + executes the sharded step on the 8-virtual-device CPU mesh."""

import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    evs, itern = jax.jit(fn)(*args)
    val = float(np.asarray(evs)[0])
    # min eig of the n=256 hopping stencil is -2cos(pi/257) ~ -1.9997
    assert abs(val - (-2.0 * np.cos(np.pi / 257))) < 1e-2


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    ge.dryrun_multichip(4)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
