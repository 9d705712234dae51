#!/bin/bash
# Phase-2 TPU validation (run when the axon tunnel is back):
#   1. compiled-vs-interpret parity of every Pallas kernel incl. the new
#      fast refine-kernel config (writes benchmarks/KERNEL_PARITY.json)
#   2. in-context S=64 ablation of each new flag + all combined
# Sequential single processes only (tunnel contention corrupts both).
set -e
cd "$(dirname "$0")/.."
echo "=== kernel parity (compiled vs interpret on the chip) ==="
JAX_PLATFORMS= timeout 2400 python tools/kernel_parity.py
echo "=== in-context ablation (fast_int8_pico) ==="
JAX_PLATFORMS= timeout 5400 python tools/bench_step_ablate.py fast_int8_pico '{
  "full": {},
  "lowres": {"refine_alpha_src": "lowres"},
  "lanes": {"guide_kernel_unfold": true},
  "bf16out": {"refined_dtype": "bf16"},
  "hostlanes": {"guide_kernel_unfold": true, "guide_source": "host"},
  "all": {"refine_alpha_src": "lowres", "guide_kernel_unfold": true,
          "refined_dtype": "bf16", "guide_source": "host"}
}'
echo "=== done; review, flip the preset, then: JAX_PLATFORMS= python bench.py ==="
