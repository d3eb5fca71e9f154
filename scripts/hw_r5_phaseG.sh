#!/bin/bash
# Round-5 phase-G runner: the two remaining unmeasured walls —
#   G1  Stokes n=360 (1.04M velocity DOFs): B3 measured precond_setup
#       972.6 s dominated by the then-eager scalar-system assembly; the
#       jitted build (61b731a) is unmeasured at this scale.  E2 at n=180
#       showed scalar_system 153.5 s pre-jit.
#   G2  modal 1M rerun IF the F3 fault fix landed (skipped otherwise —
#       edit RUN_G2=1).
cd "$(dirname "$0")/.."
LOG=/tmp/hw_r5.log
RUN_G2="${RUN_G2:-0}"

echo "=== hw r5 phase-G start $(date)" >> $LOG

echo "--- phase G1: stokes n=360, jitted scalar-system build" >> $LOG
timeout 5400 python examples/stokes_cavity.py --n 360 >> $LOG 2>&1
echo "phaseG1 rc=$?" >> $LOG

if [ "$RUN_G2" = "1" ]; then
  echo "--- phase G2: modal 1M rerun post-F3-fix" >> $LOG
  timeout 5400 python examples/modal_analysis.py --n 1000 >> $LOG 2>&1
  echo "phaseG2 rc=$?" >> $LOG
fi

echo "=== hw r5 phase-G done $(date)" >> $LOG
