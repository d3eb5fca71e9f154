#!/bin/bash
# Hardware measurement batch for the unstructured-1M AMG headline — run
# when the axon TPU tunnel is healthy (round 3's capture was blocked by
# the tunnel outage; see BENCH_NOTES.md).  Appends to /tmp/hw_results.log;
# each phase is independently skippable.  Phase order front-loads the
# driver deliverable (bench.py + warm AOT cache) so a mid-batch outage
# still leaves BENCH_r04 capturable.
cd "$(dirname "$0")/.."
echo "=== hw batch start $(date)" >> /tmp/hw_results.log

echo "--- phase 1: bench.py (driver deliverable sanity + AOT warm)" >> /tmp/hw_results.log
timeout 2400 python bench.py >> /tmp/hw_results.log 2>&1
echo "phase1 rc=$?" >> /tmp/hw_results.log

echo "--- phase 2: unstructured 1M chebyshev baseline (warms unstr AOT)" >> /tmp/hw_results.log
timeout 3600 python examples/unstructured_1m.py --precond chebyshev >> /tmp/hw_results.log 2>&1
echo "phase2 rc=$?" >> /tmp/hw_results.log

echo "--- phase 3: unstructured 1M interval-W AMG" >> /tmp/hw_results.log
timeout 3600 python examples/unstructured_1m.py --precond amg --agg interval --cycle W >> /tmp/hw_results.log 2>&1
echo "phase3 rc=$?" >> /tmp/hw_results.log

echo "--- phase 4: unstructured 1M greedy-banded AMG (strength 0.08)" >> /tmp/hw_results.log
timeout 3600 python examples/unstructured_1m.py --precond amg --agg greedy --strength 0.08 --cycle V >> /tmp/hw_results.log 2>&1
echo "phase4 rc=$?" >> /tmp/hw_results.log

echo "--- phase 5: interval-V A/B" >> /tmp/hw_results.log
timeout 1800 python examples/unstructured_1m.py --precond amg --agg interval --cycle V >> /tmp/hw_results.log 2>&1
echo "phase5 rc=$?" >> /tmp/hw_results.log

echo "--- phase 6: 20M-element generic + emit-only recapture" >> /tmp/hw_results.log
timeout 3600 python examples/generic_assembly_20m.py >> /tmp/hw_results.log 2>&1
echo "phase6 rc=$?" >> /tmp/hw_results.log

echo "--- phase 7: unstructured elasticity 1M block-AMG" >> /tmp/hw_results.log
timeout 3600 python examples/elasticity_unstructured.py --precond amg >> /tmp/hw_results.log 2>&1
echo "phase7 rc=$?" >> /tmp/hw_results.log

echo "--- phase 8: unstructured elasticity 1M block-Jacobi A/B" >> /tmp/hw_results.log
timeout 3600 python examples/elasticity_unstructured.py --precond jacobi >> /tmp/hw_results.log 2>&1
echo "phase8 rc=$?" >> /tmp/hw_results.log

echo "--- phase 9: semilinear Newton-Krylov 263k DOFs" >> /tmp/hw_results.log
timeout 1800 python examples/nonlinear_poisson.py >> /tmp/hw_results.log 2>&1
echo "phase9 rc=$?" >> /tmp/hw_results.log

echo "=== hw batch done $(date)" >> /tmp/hw_results.log
