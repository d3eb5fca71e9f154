#!/bin/bash
# Round-5 phase-D hardware batch: modal analysis re-run with the
# Chebyshev inner preconditioner (phase B5/B5b failed convergence at
# 491k DOFs on Jacobi-preconditioned inner solves — 17% eigenvalue
# error; fixed in-round, CPU-validated).  Batched vs serial A/B for the
# multi-RHS win at converged accuracy.  Waits for phase-C to drain.
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log

while ! grep -q "hw r5 phase-C done" $LOG; do sleep 60; done
echo "=== hw r5 phase-D start $(date)" >> $LOG

echo "--- phase D1: modal 491k batched, chebyshev inner" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 >> $LOG 2>&1
echo "phaseD1 rc=$?" >> $LOG

echo "--- phase D2: modal 491k serial, chebyshev inner (the A/B)" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 --serial >> $LOG 2>&1
echo "phaseD2 rc=$?" >> $LOG

echo "=== hw r5 phase-D done $(date)" >> $LOG
