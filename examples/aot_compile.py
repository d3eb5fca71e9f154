"""AOT lowering / compiled-artifact inspection — the lowered-name demo.

Parity with /root/reference/lowered-name.cpp, which exercises NVRTC name
expressions: register templated/namespaced kernels, compile, look up lowered
names, launch each, and assert the expected results (exit(1) on mismatch).
The jax analogue: lower jitted functions ahead of time, inspect the
compiled artifact (StableHLO text / cost analysis stand in for PTX and
lowered names), execute, and assert golden values.

    python examples/aot_compile.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def f1(x):          # "plain kernel"
    return x * 2.0


def f2(x):          # "templated kernel<float, 3>"
    return x ** 3 + 1.0


def f3(x, y):       # "namespaced N1::N2::kernel"
    return jnp.vdot(x, y)


def main():
    x = jnp.arange(8.0, dtype=jnp.float32)
    cases = [
        ("times_two", f1, (x,), np.arange(8.0) * 2),
        ("cube_plus_one", f2, (x,), np.arange(8.0) ** 3 + 1),
        ("dot", f3, (x, x), float(np.vdot(np.arange(8.0), np.arange(8.0)))),
    ]
    failures = 0
    for name, fn, args, expected in cases:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        # the "lowered name" analogue: the compiled executable's module name
        # and its input->output signature survive compilation
        hlo_head = lowered.as_text().splitlines()[0]
        out = np.asarray(compiled(*args))
        ok = np.allclose(out, expected)
        print(f"{name}: module={hlo_head.strip()[:60]!r} "
              f"flops={compiled.cost_analysis().get('flops', 0):.0f} "
              f"-> {'OK' if ok else 'MISMATCH'}")
        failures += 0 if ok else 1
    if failures:
        raise SystemExit(1)   # parity: lowered-name.cpp exit(1) on mismatch
    print("PASSED")


if __name__ == "__main__":
    main()
