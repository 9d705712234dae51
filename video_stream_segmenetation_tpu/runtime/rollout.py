"""In-graph serving rollouts: transport-immune step/round timing.

Why this exists (the BENCH_r03 post-mortem): on some driver hosts the
per-dispatch cost of a jitted call scales with the *size of the
executable* — the same 5.8 ms step program that a healthy transport
dispatches in ~1 ms cost ~150 ms per call, so a python-loop chain of K
steps measured the transport K times and reported 14 streams/chip for a
384-stream engine.  A python-side chain can only amortize a *fixed* RTT;
it is defenseless against per-call overhead proportional to program
size.

The fix is to move the chain INTO the compiled program and make the
iteration count a *traced* argument:

* ``make_step_rollout`` / ``make_round_rollout`` iterate the production
  step (``runtime.make_step``) or the production group-rotation round
  (``runtime.make_range_step`` unrolled over the schedule's group
  offsets — the same traced body the Engine dispatches per tick) inside
  ``lax.fori_loop``;
* because ``n`` is traced, ONE executable serves every chain length, and
  per-step time comes from the **slope** ``(t(n2) - t(n1)) / (n2 - n1)``
  — every per-dispatch cost (transport, argument handling, sync RTT,
  executable (re)load) cancels exactly, whatever its size;
* each iteration XORs a per-iteration tag into the u8 frames so no
  sub-graph is loop-invariant — with a fixed input XLA hoists the whole
  matting forward out of the loop and the "step" times only the tail
  (measured: benchmarks/RESULTS.md "honest scan harness");
* every iteration's output frame/alpha is add-accumulated into a carried
  buffer, so the full composite/tail work stays live (syncing on a
  corner slice lets XLA slice-propagate the tail away).  The accumulate
  costs one extra read of the accumulator per group vs the production
  step, i.e. the rollout slightly OVERSTATES step cost — the
  conservative direction for a capacity claim.

Reference contract: the number of record must measure the real serving
loop on the real chip (the reference's overlay FPS counter measures its
rAF loop, client/src/core/main.ts:96-105); these rollouts are the
tunnel-robust way to do that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from video_stream_segmenetation_tpu.runtime.pipeline import (
    ModelBundle,
    make_round_step,
    make_step,
)
from video_stream_segmenetation_tpu.runtime.config import PipelineStatics


def _perturb(frames, i):
    """Make ``frames`` depend on the loop counter without touching HBM
    more than the consumers already do: XOR a 1-bit per-iteration tag
    into the u8 payload (fuses into the consumers' u8 reads; value
    changes every iteration so nothing upstream of the state carry is
    loop-invariant)."""
    tag = (i & 1).astype(jnp.uint8)

    def one(f):
        if f.dtype == jnp.uint8:
            return jnp.bitwise_xor(f, tag)
        return f + tag.astype(f.dtype)

    if isinstance(frames, tuple):
        return tuple(one(f) for f in frames)
    return one(frames)


def _perturb_params(params, i):
    """Make the PARAMS depend on the loop counter: adds a ±1-ulp-scale
    epsilon to every float leaf (a ~5 MB tree — free next to the step).
    Zero frame-side cost: unlike the frame XOR, nothing is materialized
    at the Pallas custom-call boundaries.  Everything downstream of any
    weight is loop-variant; the only production work that can still
    hoist is the pure frames->guide reorg (no params on that path) —
    bench.py prices that term separately (no_guide delta, RESULTS.md)."""
    eps = (i & 1).astype(jnp.float32) * 1e-7

    def one(p):
        if jnp.issubdtype(p.dtype, jnp.floating):
            return p + eps.astype(p.dtype)
        return p

    return jax.tree_util.tree_map(one, params)


def _acc_init(out, mode):
    if mode == "reduce":
        return (
            jnp.sum(out["frame"].astype(jnp.int32), axis=range(1, out["frame"].ndim)),
            jnp.sum(out["alpha"], axis=range(1, out["alpha"].ndim)),
        )
    return (out["frame"], out["alpha"])


def _acc_add(acc, out, mode):
    a, b = _acc_init(out, mode)
    return (acc[0] + a, acc[1] + b)


def make_step_rollout(bundle: ModelBundle, statics: PipelineStatics,
                      acc_mode: str = "buffer", perturb="xor"):
    """``roll(params, state, frames, bgs, knobs, gate, n) ->
    (new_state, acc_frame, acc_alpha)``: the production batch step
    (``make_step``) iterated ``n`` times in-graph (``n`` traced, >= 1).

    Chain it at two counts and take the slope — see the module
    docstring.  Jit with ``donate_argnums=(1,)`` and feed each call the
    previous call's returned state to chain across dispatches too.

    ``acc_mode``: how each iteration's outputs are kept live.
      'buffer' — add into a carried output-shaped buffer: every store
        the production step makes happens here too, plus one extra read
        of the accumulator (slight OVERcount — conservative).
      'reduce' — per-stream sum, fuses into the producers: all compute
        stays live but the final output store is elided (slight
        UNDERcount by one store).
    The production number lies between the two; bench.py reports both.

    ``perturb``: what varies per iteration so XLA cannot hoist the
    loop-invariant forward out of the loop (measured real, RESULTS.md).
      'xor' — XOR a 1-bit tag into the u8 frames.  Full-fidelity (every
        frames consumer live) but the perturbed frames materialize at
        the Pallas custom-call boundary (~0.4-0.9 ms overcount).
      'weights' — epsilon on every float param leaf.  Zero-copy; the
        pure frames->guide reorg (paramless) may hoist (~0.3 ms
        undercount, the no_guide delta).
      False — no perturbation: harness-term diagnostic only, NOT a
        valid step time."""
    if perturb is True:
        perturb = "xor"
    step = make_step(bundle, statics)

    def roll(params, state, frames, bgs, knobs, gate, n):
        state, out = step(params, state, frames, bgs, knobs, gate)
        accs = _acc_init(out, acc_mode)

        def body(i, carry):
            st, acc = carry
            fr = _perturb(frames, i) if perturb == "xor" else frames
            pr = _perturb_params(params, i) if perturb == "weights" else params
            st, o = step(pr, st, fr, bgs, knobs, gate)
            return st, _acc_add(acc, o, acc_mode)

        state, accs = lax.fori_loop(1, n, body, (state, accs))
        return state, accs[0], accs[1]

    return roll


def make_round_rollout(
    bundle: ModelBundle,
    statics: PipelineStatics,
    group_sizes: "list[int]",
    tick_dt: float = 1.0 / 30.0,
    acc_mode: str = "buffer",
    perturb="xor",
):
    """``roll(params, full_state, frames_list, full_bgs, full_knobs,
    face_last, now0, min_interval, n) -> (new_full_state, new_face_last,
    accs)``: ``n`` full rounds of the production group rotation, one
    jitted program.

    One round = the exact per-tick body the Engine dispatches for each
    group (``runtime.make_range_step``: in-graph slice/scatter over the
    full donated state + device-resident face min-interval gate),
    unrolled over the schedule's static group offsets — what
    ``StreamScheduler(group_sizes=...).step_pipelined`` runs per tick,
    iterated in-graph.  ``now`` advances by ``tick_dt`` per round so the
    face min-interval cadence behaves as in production.

    ``frames_list``: one device frame batch per group (the scheduler's
    ``frame_source`` shape).  Jit with ``donate_argnums=(1, 5)``.
    ``acc_mode``/``perturb``: see make_step_rollout.
    """
    if perturb is True:
        perturb = "xor"
    round_step = make_round_step(bundle, statics, group_sizes)

    def roll(params, full_state, frames_list, full_bgs, full_knobs,
             face_last, now0, min_interval, n):
        def one_round(state, face_last, now, xform, pr):
            return round_step(
                pr, state, [xform(f) for f in frames_list], full_bgs,
                full_knobs, face_last, now, min_interval,
            )

        state, face_last, outs = one_round(
            full_state, face_last, now0, lambda f: f, params
        )
        accs = tuple(_acc_init(o, acc_mode) for o in outs)

        def body(i, carry):
            state, face_last, accs = carry
            now = now0 + i.astype(now0.dtype) * jnp.asarray(
                tick_dt, now0.dtype
            )
            state, face_last, outs = one_round(
                state, face_last, now,
                (lambda f: _perturb(f, i)) if perturb == "xor"
                else (lambda f: f),
                _perturb_params(params, i) if perturb == "weights"
                else params,
            )
            accs = tuple(
                _acc_add(a, o, acc_mode) for a, o in zip(accs, outs)
            )
            return state, face_last, accs

        state, face_last, accs = lax.fori_loop(
            1, n, body, (state, face_last, accs)
        )
        return state, face_last, accs

    return roll
