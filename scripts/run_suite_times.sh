#!/bin/bash
# Regenerate scripts/suite_times.txt: run every test file separately and
# record its wall time + pass/fail line.  Run at code freeze on a quiet
# box (never concurrently with TPU capture windows).
#   bash scripts/run_suite_times.sh [outfile]
cd "$(dirname "$0")/.."
OUT=${1:-scripts/suite_times.txt}
TMP=$(mktemp)
total_start=$(date +%s)
echo "# Per-file suite wall times (1-core build box, $(date -u '+%Y-%m-%d %H:%M UTC') run)" > "$TMP"
echo "# Files are invoked separately, so early files reflect the tree at their start time." >> "$TMP"
fail=0
for f in tests/test_*.py; do
  s=$(date +%s)
  line=$(timeout 1800 python -m pytest "$f" -q 2>&1 | tail -1)
  rc=$?
  e=$(date +%s)
  [ $rc -ne 0 ] && fail=1 && line="FAILED(rc=$rc) $line"
  echo "$((e - s))s  $f  :: $line" >> "$TMP"
  echo "$((e - s))s  $f  :: $line"
done
total_end=$(date +%s)
echo "# total wall: $((total_end - total_start))s, fail=$fail" >> "$TMP"
mv "$TMP" "$OUT"
exit $fail
