#!/bin/bash
# Dev harness: wait for a quiet host window (low loadavg AND low CPU
# steal over a 5 s probe), then run the given command. The sandbox host
# is shared — un-gated timing runs routinely absorb 2-10x multiplicative
# noise (see INCIDENTS.md R15-1/R17-1).
# Usage: scripts/quiet_run.sh <max_load> <cmd...>
set -u
MAXLOAD=$1; shift
for i in $(seq 1 120); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  S1=$(awk '/^cpu /{print $9}' /proc/stat); sleep 5
  S2=$(awk '/^cpu /{print $9}' /proc/stat)
  STEAL=$((S2 - S1))   # ticks stolen in 5 s; 100 ticks = 1 core-second
  OK=$(python3 -c "print(1 if float('$L') < float('$MAXLOAD') and $STEAL < 150 else 0)")
  if [ "$OK" = "1" ]; then
    echo "[quiet_run] load=$L steal=${STEAL}t — running" >&2
    exec "$@"
  fi
  echo "[quiet_run] waiting: load=$L steal=${STEAL}t" >&2
  sleep 10
done
echo "[quiet_run] no quiet window after 30 min — running anyway" >&2
exec "$@"
