#!/bin/bash
# Round-5 phase-B hardware batch: (a) re-run the phase-A failures against
# the VMEM-limit fix (greedy-banded AMG 1M; elasticity block-AMG with the
# native Galerkin setup), (b) put the round-4 physics on the chip
# (VERDICT r4 item 4): Stokes fp32 @ >=1M velocity DOFs, leapfrog wave
# @ 1M DOFs, modal analysis @ ~0.5M DOFs batched vs serial.
# Appends to /tmp/hw_r5.log; phases independent.
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log
echo "=== hw r5 phase-B start $(date)" >> $LOG

echo "--- phase B1: greedy-banded AMG 1M (post VMEM-limit fix)" >> $LOG
timeout 3600 python examples/unstructured_1m.py --precond amg --agg greedy --strength 0.08 --cycle V >> $LOG 2>&1
echo "phaseB1 rc=$?" >> $LOG

echo "--- phase B2: elasticity 1M block-AMG (native Galerkin setup)" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> $LOG 2>&1
echo "phaseB2 rc=$?" >> $LOG

echo "--- phase B3: stokes cavity fp32 + velocity-AMG, 1.04M velocity DOFs" >> $LOG
timeout 5400 python examples/stokes_cavity.py --n 360 --tol 1e-6 >> $LOG 2>&1
rc=$?
echo "phaseB3 rc=$rc" >> $LOG
if [ $rc -ne 0 ]; then
  echo "--- phase B3b: stokes fallback n=180 (465k velocity DOFs)" >> $LOG
  timeout 3600 python examples/stokes_cavity.py --n 180 --tol 1e-6 >> $LOG 2>&1
  echo "phaseB3b rc=$?" >> $LOG
fi

echo "--- phase B4: leapfrog wave 1M DOFs (steps/s vs SpMV roofline)" >> $LOG
timeout 3600 python examples/wave_equation.py --cells 1000 --periods 1 >> $LOG 2>&1
echo "phaseB4 rc=$?" >> $LOG

echo "--- phase B5: modal analysis 491k DOFs, batched inner solves" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 >> $LOG 2>&1
echo "phaseB5 rc=$?" >> $LOG

echo "--- phase B5b: modal 491k serial (the A/B for the batched win)" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 --serial >> $LOG 2>&1
echo "phaseB5b rc=$?" >> $LOG

echo "--- phase B6: bench.py (first_exec_s decomposition + green check)" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "phaseB6 rc=$?" >> $LOG

echo "=== hw r5 phase-B done $(date)" >> $LOG
