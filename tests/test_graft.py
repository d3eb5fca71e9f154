"""Driver entry points: entry() compiles single-chip; dryrun_multichip runs
the full distributed step on the virtual CPU mesh."""
import sys

import numpy as np
import jax


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    x, relres = out
    assert np.isfinite(np.asarray(x)).all()
    assert float(relres) < 1e-4


def test_dryrun_multichip(cpu_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_examples_importable():
    """Example scripts must at least import (they are user documentation)."""
    import importlib.util
    import pathlib

    for name in ["poisson_2d", "poisson_3d_multigrid", "reduction_bench",
                 "saxpy_pallas", "aot_compile"]:
        path = pathlib.Path("/root/repo/examples") / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main")
