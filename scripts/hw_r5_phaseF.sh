#!/bin/bash
# Round-5 phase-F runner: hardware verdicts on the two late-round fixes —
# the boundary-singleton aggregation merge (AMG setup walls) and the
# mixed-precision eigen solver (modal convergence at scale).
#   F1  elasticity 982k block-AMG — singleton-merge + ratio-2 retry
#       (E1 baseline: precond_setup 541.8 s, coarse 10506 blocks)
#   F2  modal 491k mixed precision (E3 baseline: 6.6% eigenvalue error,
#       O(1) residuals in pure fp32)
#   F3  modal 1M mixed precision (flagship scale)
#   F4  unstructured_1m scalar AMG (B1 baseline: 55 s setup with a
#       4450-row coarsest of which 4000 were boundary singletons)
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log

echo "=== hw r5 phase-F start $(date)" >> $LOG

echo "--- phase F1: elasticity 982k block-AMG, singleton-merge setup" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> $LOG 2>&1
echo "phaseF1 rc=$?" >> $LOG

echo "--- phase F2: modal 491k mixed precision, amg inner" >> $LOG
timeout 3600 python examples/modal_analysis.py --n 700 >> $LOG 2>&1
echo "phaseF2 rc=$?" >> $LOG

echo "--- phase F3: modal 1M mixed precision, amg inner" >> $LOG
timeout 5400 python examples/modal_analysis.py --n 1000 >> $LOG 2>&1
echo "phaseF3 rc=$?" >> $LOG

echo "--- phase F4: unstructured 1M scalar AMG, singleton-merge setup" >> $LOG
timeout 3600 python examples/unstructured_1m.py --precond amg >> $LOG 2>&1
echo "phaseF4 rc=$?" >> $LOG

echo "=== hw r5 phase-F done $(date)" >> $LOG
