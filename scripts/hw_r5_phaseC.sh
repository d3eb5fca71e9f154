#!/bin/bash
# Round-5 phase-C hardware batch: re-measure the paths changed after
# phase B ran — (C1) elasticity block-AMG with BANDED-EMBEDDED transfers
# (bd7b8a9; phase B2 measured 46.9 ms/PCG-iter on gather transfers) plus
# the precond_setup decomposition (25b58c8), (C2) Stokes velocity-AMG
# setup decomposition at a mid size (the 972.6 s wall from phase B3).
# Waits for the phase-B batch to drain first.  Appends to /tmp/hw_r5.log.
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log

while ! grep -q "hw r5 phase-B done" $LOG; do sleep 60; done
echo "=== hw r5 phase-C start $(date)" >> $LOG

echo "--- phase C1: elasticity 1M block-AMG, banded-embedded transfers" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> $LOG 2>&1
echo "phaseC1 rc=$?" >> $LOG

echo "--- phase C2: stokes cavity n=180 (465k vel DOFs), setup decomposition" >> $LOG
timeout 3600 python examples/stokes_cavity.py --n 180 --tol 1e-6 >> $LOG 2>&1
echo "phaseC2 rc=$?" >> $LOG

echo "=== hw r5 phase-C done $(date)" >> $LOG
