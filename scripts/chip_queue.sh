#!/usr/bin/env bash
# Chip measurements queued behind the r3 axon tunnel outage, in priority
# order. Run when the tunnel is back; NEVER run two TPU jobs at once
# (the second blocks on the device lock). Each writes docs/assets/*.json
# that bench.py echoes into the BENCH tail.
set -e
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "import jax; assert jax.devices()[0].platform=='tpu'; import jax.numpy as jnp; float(jnp.ones((4,4)).sum())"
}

probe || { echo "tunnel still dead"; exit 2; }

echo "== distill E2E: RRDB teacher -> SRVGG student -> served int8"
timeout 3600 python scripts/bench_distill_e2e.py 2>&1 | tail -8

echo "== video SR serving"
timeout 2400 python scripts/bench_video.py 2>&1 | tail -5

echo "== microbatch serving (serve/batching.py, r4 pipelined dispatch)"
timeout 1800 python scripts/bench_microbatch.py 2>&1 | tail -5

echo "== E2E incl. the real process_batch wall + geometry auto-select"
timeout 1800 python scripts/bench_e2e.py 2>&1 | tail -8

echo "== detector convergence (on-device synth scenes)"
timeout 1800 python scripts/bench_detector_convergence.py 2>&1 | tail -8

echo "== GAN-vs-L1 ablation (PSNR + NIQE + GMS + triptychs)"
timeout 3600 python scripts/bench_gan_ablation.py 2>&1 | tail -8

echo "== QAT/distill serving-aware trainers"
timeout 2400 python scripts/bench_qat_distill.py 2>&1 | tail -8

echo "== DCN kernel study (EDVR PCD shapes)"
timeout 2400 python scripts/bench_dcn.py 2>&1 | tail -8

echo "== headline refresh"
timeout 3600 python bench.py 2>&1 | tail -20
