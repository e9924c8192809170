#!/usr/bin/env bash
# Probe the axon tunnel until a tiny op completes fast enough, then run
# the given command. The tunnel intermittently degrades to minutes-per-
# dispatch (observed 2026-08-19: 134-192s for an 8x8 matmul); launching a
# long training bench into that state just burns its wall budget.
#
# Usage: scripts/chip_wait_and_run.sh <max_wait_s> <healthy_s> cmd...
set -u
MAX_WAIT=${1:?max wait seconds}
HEALTHY=${2:?healthy tiny-op seconds}
shift 2
t0=$(date +%s)
while :; do
  took=$(timeout 600 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((8,8)); float((x@x).sum())
print(round(time.time()-t0,1))
" 2>/dev/null | tail -1)
  now=$(date +%s)
  if [ -n "${took:-}" ] && python -c "exit(0 if float('$took') <= $HEALTHY else 1)" 2>/dev/null; then
    echo "tunnel healthy (tiny op ${took}s) after $((now - t0))s wait — running: $*" >&2
    exec "$@"
  fi
  echo "tunnel slow/dead (tiny op ${took:-timeout}s) at +$((now - t0))s" >&2
  if [ $((now - t0)) -ge "$MAX_WAIT" ]; then
    echo "gave up after ${MAX_WAIT}s" >&2
    exit 3
  fi
  sleep 120
done
