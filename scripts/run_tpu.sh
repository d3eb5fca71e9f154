#!/usr/bin/env bash
# TPU-VM job runner — the cluster-submission analogue of the reference's PBS
# script (/root/reference/job.pbs: 1 node x 1 ppn, walltime, mpiexec of one
# binary).  On a TPU VM there is no scheduler shim: set the JAX distributed
# env (multi-host pods pick hosts up from the TPU metadata), pick the
# workload, run it under a walltime.
#
# Usage:
#   scripts/run_tpu.sh bench                    # the headline benchmark
#   scripts/run_tpu.sh example poisson_2d --cells 128
#   WALLTIME=600 scripts/run_tpu.sh bench
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
WALLTIME="${WALLTIME:-1800}"   # seconds (PBS walltime parity, job.pbs:4)

cmd="${1:-bench}"
shift || true

case "$cmd" in
  bench)
    exec timeout "$WALLTIME" python "$REPO/bench.py" "$@"
    ;;
  example)
    name="$1"; shift
    exec timeout "$WALLTIME" python "$REPO/examples/$name.py" "$@"
    ;;
  tests)
    exec timeout "$WALLTIME" python -m pytest "$REPO/tests" -q "$@"
    ;;
  *)
    echo "usage: run_tpu.sh {bench|example <name>|tests} [args...]" >&2
    exit 2
    ;;
esac
