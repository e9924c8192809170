#!/usr/bin/env bash
# Sharded quick test pass: N parallel pytest processes over tests/ -m 'not slow'.
#
# CPU pytest shards coexist fine (tests/conftest.py forces the cpu backend
# with 8 virtual devices per process); there is no pytest-xdist in this
# image, so shard at the file level. The heavy files (measured with
# --durations, see docs/ROUND3.md) are seeded first so they spread across
# shards; everything else round-robins after them, so new test files are
# picked up automatically.
#
# Usage: scripts/run_quick_tests.sh [num_shards]   (default 4)

set -u
N=${1:-4}
cd "$(dirname "$0")/.."

HEAVY="tests/test_serve.py tests/test_video_archs.py tests/test_models.py \
tests/test_detect.py tests/test_archs.py tests/test_quantized_inference.py \
tests/test_spatial.py tests/test_fused_resample.py tests/test_tiling.py \
tests/test_convert_clis.py tests/test_export_restorer.py tests/test_degradations.py"

ORDERED="$HEAVY"
for f in tests/test_*.py; do
  case " $HEAVY " in
    *" $f "*) ;;
    *) ORDERED="$ORDERED $f" ;;
  esac
done

declare -a SHARD
i=0
for f in $ORDERED; do
  s=$((i % N))
  SHARD[$s]="${SHARD[$s]:-} $f"
  i=$((i + 1))
done

pids=()
for s in $(seq 0 $((N - 1))); do
  # shellcheck disable=SC2086
  python -m pytest ${SHARD[$s]} -q -m 'not slow' -p no:cacheprovider \
    >"/tmp/quick_shard_$s.log" 2>&1 &
  pids+=($!)
done

rc=0
for s in $(seq 0 $((N - 1))); do
  code=0
  wait "${pids[$s]}" || code=$?
  # pytest exit 5 = "no tests collected" (a shard of slow-only files)
  if [ "$code" -ne 0 ] && [ "$code" -ne 5 ]; then
    rc=1
    echo "shard $s FAILED (exit $code) — /tmp/quick_shard_$s.log:"
    grep -E "FAILED|ERROR" "/tmp/quick_shard_$s.log" | head -20
  fi
  tail -1 "/tmp/quick_shard_$s.log"
done
exit $rc
