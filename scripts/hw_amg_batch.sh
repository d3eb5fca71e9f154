#!/bin/bash
# Hardware measurement batch for the round-3 interval-W AMG headline —
# run when the axon TPU tunnel is healthy (see BENCH_NOTES.md "tunnel
# outage"; the outage blocked this capture in round 3).  Appends to
# /tmp/hw_results.log; each phase is independently skippable.
cd "$(dirname "$0")/.."
echo "=== hw batch start $(date)" >> /tmp/hw_results.log

echo "--- phase 1: bench.py (driver deliverable sanity)" >> /tmp/hw_results.log
timeout 2400 python bench.py >> /tmp/hw_results.log 2>&1
echo "phase1 rc=$?" >> /tmp/hw_results.log

echo "--- phase 2: unstructured 1M interval-W AMG headline" >> /tmp/hw_results.log
timeout 3600 python examples/unstructured_1m.py --precond amg --agg interval --cycle W >> /tmp/hw_results.log 2>&1
echo "phase2 rc=$?" >> /tmp/hw_results.log

echo "--- phase 3: interval-V A/B" >> /tmp/hw_results.log
timeout 1800 python examples/unstructured_1m.py --precond amg --agg interval --cycle V >> /tmp/hw_results.log 2>&1
echo "phase3 rc=$?" >> /tmp/hw_results.log

echo "=== hw batch done $(date)" >> /tmp/hw_results.log
