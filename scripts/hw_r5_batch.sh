#!/bin/bash
# Round-5 phase-A hardware batch: turn the round-4 post-fix commits into
# measured numbers (VERDICT r4 item 1) and localize the interval-AMG
# device fault (item 2).  Appends to /tmp/hw_r5.log; phases independent.
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log
echo "=== hw r5 phase-A start $(date)" >> $LOG

echo "--- phase 1: bench.py (driver deliverable sanity + AOT warm)" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "phase1 rc=$?" >> $LOG

echo "--- phase 2: unstructured 1M chebyshev control (post-fix tree)" >> $LOG
timeout 3600 python examples/unstructured_1m.py --precond chebyshev >> $LOG 2>&1
echo "phase2 rc=$?" >> $LOG

echo "--- phase 3: unstructured 1M greedy-banded AMG post-gather-fix (the A/B)" >> $LOG
timeout 3600 python examples/unstructured_1m.py --precond amg --agg greedy --strength 0.08 --cycle V >> $LOG 2>&1
echo "phase3 rc=$?" >> $LOG

echo "--- phase 4: elasticity 1M block-Jacobi (jitted assembly + banded block cycle)" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond jacobi >> $LOG 2>&1
echo "phase4 rc=$?" >> $LOG

echo "--- phase 4b: elasticity 1M block-AMG (native Galerkin setup + banded block cycle)" >> $LOG
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> $LOG 2>&1
echo "phase4b rc=$?" >> $LOG

echo "--- phase 5: interval-AMG fault bisect (n sweep, V then W)" >> $LOG
for n in 354 500 707 1000; do
  for cyc in V W; do
    echo "-- interval $cyc n=$n" >> $LOG
    timeout 1800 python examples/unstructured_1m.py --n $n --precond amg --agg interval --cycle $cyc >> $LOG 2>&1
    echo "interval_${cyc}_n${n} rc=$?" >> $LOG
  done
done

echo "=== hw r5 phase-A done $(date)" >> $LOG
