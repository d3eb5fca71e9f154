"""Driver entry points: entry() compiles single-chip; dryrun_multichip runs
the full distributed step on the virtual CPU mesh."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    x, relres = out
    assert np.isfinite(np.asarray(x)).all()
    assert float(relres) < 1e-4


class _PoisonedDevice:
    """Fake ambient device handle: enumerates fine, dies on first use.

    Models the round-2 driver environment, where the axon TPU plugin listed
    8 handles whose first device_put raised FAILED_PRECONDITION (libtpu
    version mismatch, MULTICHIP_r02.json)."""
    platform = "tpu"
    id = 0


def _poison_ambient(monkeypatch):
    real_devices = jax.devices
    real_put = jax.device_put

    def fake_devices(platform=None):
        if platform is None:
            return [_PoisonedDevice() for _ in range(8)]
        return real_devices(platform)

    def fake_put(x, device=None, **kw):
        if isinstance(device, _PoisonedDevice):
            raise RuntimeError(
                "FAILED_PRECONDITION: libtpu version mismatch (simulated)")
        return real_put(x, device, **kw)

    monkeypatch.setattr(jax, "devices", fake_devices)
    monkeypatch.setattr(jax, "device_put", fake_put)


def test_dryrun_multichip_with_poisoned_ambient(cpu_devices, monkeypatch):
    """The FULL dryrun must complete on the CPU mesh even when ambient
    device enumeration reports 8 unusable TPU handles (VERDICT.md r2 #1)."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    _poison_ambient(monkeypatch)
    monkeypatch.delenv("TPUFEM_DRYRUN_AMBIENT", raising=False)
    ge.dryrun_multichip(8)


def test_cpu_mesh_devices_never_trusts_unprobed_ambient(cpu_devices,
                                                        monkeypatch):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    _poison_ambient(monkeypatch)
    # default: ambient is never consulted -> cpu devices
    monkeypatch.delenv("TPUFEM_DRYRUN_AMBIENT", raising=False)
    devs = ge._cpu_mesh_devices(8)
    assert all(d.platform == "cpu" for d in devs)
    # opt-in: ambient is probed, the probe fails -> still cpu devices
    monkeypatch.setenv("TPUFEM_DRYRUN_AMBIENT", "1")
    devs = ge._cpu_mesh_devices(8)
    assert all(d.platform == "cpu" for d in devs)


@pytest.mark.slow
def test_dryrun_multichip_bare_subprocess():
    """Run the driver's exact check in a fresh process with scrubbed env.

    slow: duplicates the in-process dryrun's ~2.5 min of coverage in a
    second interpreter (what it uniquely checks is the env bootstrap);
    the full per-round suite still runs it.

    Round 1 failed because conftest pre-set XLA_FLAGS, masking that
    __graft_entry__ did not self-provision the virtual CPU mesh
    (VERDICT.md item 1). This test removes every jax-related env var so the
    module must do the provisioning itself.
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, (
        f"bare dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert "dryrun_multichip(8)" in proc.stdout


def test_examples_importable():
    """Example scripts must at least import (they are user documentation)."""
    import importlib.util
    import pathlib

    for name in ["poisson_2d", "poisson_3d_multigrid", "reduction_bench",
                 "saxpy_pallas", "aot_compile", "heat_equation",
                 "poisson_10m", "elasticity_1m", "unstructured_1m",
                 "generic_assembly_20m"]:
        path = pathlib.Path("/root/repo/examples") / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main")
