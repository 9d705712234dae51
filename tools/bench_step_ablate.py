"""In-context step ablation: where the 64-stream step time goes.

Isolated jit micro-benches LIE on this machine (arg-layout conversions at
jit boundaries dominate; a gather that costs 16 ms standalone costs 1.4 ms
inside the step).  This tool times the REAL engine step under statics
variants instead -- differences between variants attribute cost to the
toggled stage.

Each variant runs in its OWN subprocess: a process that performs a long
tunnel compile has degraded dispatch (~100x) for the rest of its life
(ARCHITECTURE.md perf notes), so sharing one process across variants
poisons every measurement after the first cold compile.

Run: JAX_PLATFORMS= python tools/bench_step_ablate.py [preset] [variants-json]
(default preset: fast_int8_lite; variants-json = {"name": {override: v}}
replaces the built-in variant table, e.g.
  '{"full": {}, "K=1": {"face_batch": 1}}')
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_lite"

VARIANTS = {
    "full": {},
    "matting bf16": {"matting_precision": "bf16"},
    "pallas int8 convs": {"int8_conv_impl": "pallas"},
    "no face": {"face_path": False},
    "face from frames": {"face_input": "frames"},
    "XLA refine chain": {"use_fused_refine": False},
}
if len(sys.argv) > 2:
    VARIANTS = json.loads(sys.argv[2])

_CHILD = r"""
import dataclasses, json, time, sys
sys.path.insert(0, %(root)r)
import os as _osp
import numpy as np
import jax
if _osp.environ.get("VST_CHILD_PLATFORM"):
    # the axon plugin overrides the env var; only jax.config wins
    jax.config.update("jax_platforms", _osp.environ["VST_CHILD_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.runtime.presets import preset
from video_stream_segmenetation_tpu.service.engine import Engine

import os as _os0
S, N = int(_os0.environ.get("VST_S", "64")), int(_os0.environ.get("VST_N", "20"))
overrides = json.loads(%(overrides)r)
statics = dataclasses.replace(preset(%(base)r), **overrides)
key = jax.random.PRNGKey(0)
fp = jax.jit(
    lambda k: ops.space_to_depth(
        (jax.random.uniform(k, (S, *statics.frame_hw, 3)) * 255).astype(jnp.uint8),
        statics.s2d_block,
    )
)(key)
def _with_lanes(fr):
    # guide_source='host': step input is (packed, lanes) -- lanes are
    # host-ingest work in production (native framebuf), derived at setup
    if statics.guide_source != "host":
        return fr
    return fr, jax.jit(
        lambda f: ops.guide_lanes_s2d(
            f, statics.frame_hw, statics.mask_hw, statics.s2d_block
        )[0]
    )(fr)
fp = _with_lanes(fp)
eng = Engine(num_streams=S, statics=statics, donate_state=False)
for _ in range(S):
    eng.admit()
bgs, gate = eng.backgrounds, jnp.ones((S,), bool)
red = jax.jit(lambda f: jnp.sum(f.ravel()[:4].astype(jnp.int32)))

import os as _os
if _os.environ.get("VST_SCAN"):
    # chain inside ONE jit via lax.scan: removes the per-dispatch tunnel
    # overhead from the measurement (each async execute is an HTTP call;
    # short programs otherwise floor at the RTT).  Two DCE traps this
    # harness defends against: (1) the full out["frame"] is reduced into
    # the carry, so no stage is dead; (2) frames rotate through NBUF
    # distinct device buffers per step -- with a FIXED input the model
    # forward is loop-invariant and XLA hoists it OUT of the scan
    # entirely (observed: trunk-only "0.59 ms").  Production serving
    # also reads fresh frames every step, so the rotating read is part
    # of the honest cost, not overhead.
    step_fn = eng._step  # jit-of-jit inlines when traced inside scan
    NBUF = 4
    fstack = jax.jit(
        lambda k: ops.space_to_depth(
            (jax.random.uniform(
                k, (NBUF, S, *statics.frame_hw, 3)
            ) * 255).astype(jnp.uint8),
            statics.s2d_block,
        )
    )(key)
    if statics.guide_source == "host":
        fstack = (fstack, jax.jit(
            lambda st_: jnp.stack([
                ops.guide_lanes_s2d(
                    st_[i], statics.frame_hw, statics.mask_hw,
                    statics.s2d_block,
                )[0]
                for i in range(NBUF)
            ])
        )(fstack))

    def _scan_chain(params, st0, stack, bgs, knobs, gate, n):
        def body(carry, i):
            st, acc = carry
            if isinstance(stack, tuple):
                f = (
                    jax.lax.dynamic_index_in_dim(stack[0], i %% NBUF, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(stack[1], i %% NBUF, 0, keepdims=False),
                )
            else:
                f = jax.lax.dynamic_index_in_dim(stack, i %% NBUF, 0, keepdims=False)
            st, out = step_fn(params, st, f, bgs, knobs, gate)
            acc = acc + jnp.sum(out["frame"], dtype=jnp.float32)
            return (st, acc), None

        (st, acc), _ = jax.lax.scan(
            body, (st0, jnp.float32(0.0)), jnp.arange(n, dtype=jnp.int32)
        )
        return st, {"frame": acc * 0.0}

    _scan_jit = {}

    def chain(n):
        if n not in _scan_jit:
            _scan_jit[n] = jax.jit(
                lambda p, s, f, b, k, g: _scan_chain(p, s, f, b, k, g, n)
            )
        return _scan_jit[n](eng.bundle.params, eng.state, fstack, bgs, eng.knobs, gate)
else:
    def chain(n):
        st = eng.state
        for _ in range(n):
            st, out = eng._step(eng.bundle.params, st, fp, bgs, eng.knobs, gate)
        return st, out

st, out = chain(2)
_ = np.asarray(red(out["frame"]))
t0 = time.perf_counter()
_ = np.asarray(red(out["frame"]))
rtt = (time.perf_counter() - t0) * 1e3
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    st, out = chain(N)
    _ = np.asarray(red(out["frame"]))
    best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / N)
print("RESULT", json.dumps({"ms": best}))
"""


def main():
    results = {}
    for name, overrides in VARIANTS.items():
        code = _CHILD % {"root": ROOT, "base": BASE, "overrides": json.dumps(overrides)}
        r = subprocess.run(
            [sys.executable, "-u", "-c", code], capture_output=True, text=True,
            timeout=3000,
            env=dict(
                os.environ,
                JAX_PLATFORMS=os.environ.get("VST_CHILD_PLATFORM", ""),
            ),
        )
        ms = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                ms = json.loads(line[len("RESULT "):])["ms"]
        if ms is None:
            print(f"{name:34s}  FAILED: {(r.stderr or r.stdout)[-200:]}", flush=True)
            continue
        results[name] = ms
        print(f"{name:34s} {ms:7.2f} ms", flush=True)
    if "full" in results:
        full = results["full"]
        print(f"\n{BASE}: full step = {full:.2f} ms -> "
              f"{64 * min(33.33 / full, 4.0):.1f} sustained 720p30 streams/chip")


if __name__ == "__main__":
    main()
