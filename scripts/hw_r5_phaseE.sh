#!/bin/bash
# Round-5 phase-E runner: re-measures everything the late round-5 fixes
# touched, on the real chip.  Appends to /tmp/hw_r5.log.
#   E1  elasticity 982k block-AMG — Cholesky coarse_inv (was eigh 393.9 s
#       of the 487.5 s precond_setup, phase C1) + stall-retry aggregation
#   E2  stokes cavity n=180 — velocity-AMG setup decomposition (the C2
#       print crash fixed)
#   E3  modal 491k batched, AMG inner preconditioner (Chebyshev inner
#       left 6.6% eigenvalue error / O(1) residuals in phase D1)
#   E4  modal 491k serial, AMG inner (the batched-vs-serial A/B)
#   E5  bench.py — confirm the headline after the cg_fixed 0/0 guard
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log

echo "=== hw r5 phase-E start $(date)" >> $LOG

echo "--- phase E1: elasticity 982k block-AMG, cholesky coarse_inv" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> $LOG 2>&1
echo "phaseE1 rc=$?" >> $LOG

echo "--- phase E2: stokes cavity n=180 (465k vel DOFs), setup decomposition" >> $LOG
timeout 3600 python examples/stokes_cavity.py --n 180 --tol 1e-6 >> $LOG 2>&1
echo "phaseE2 rc=$?" >> $LOG

echo "--- phase E3: modal 491k batched, amg inner" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 >> $LOG 2>&1
echo "phaseE3 rc=$?" >> $LOG

echo "--- phase E4: modal 491k serial, amg inner (the A/B)" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 --serial >> $LOG 2>&1
echo "phaseE4 rc=$?" >> $LOG

echo "--- phase E5: bench.py post cg_fixed-guard" >> $LOG
timeout 3600 python bench.py >> $LOG 2>&1
echo "phaseE5 rc=$?" >> $LOG

echo "=== hw r5 phase-E done $(date)" >> $LOG
