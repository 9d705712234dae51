"""Host-side stream scheduler: the serving loop around the device step.

Replaces the reference's rAF loop + promise mutex + landmark cadence gates
(client/src/core/main.ts:18-22,52-64) for the many-stream case:

* frames arrive per stream (from the native FramePool rings or direct
  pushes) and are batched at a fixed tick;
* face-model cadence is **staggered** across streams: stream s gets
  initial frame phase ``s % lmk_interval``, so each step only
  ~S/interval streams hit their `frameIdx % interval == 0` gate instead
  of a thundering herd (the batched generalization of main.ts:55-64);
* the per-stream min-interval ms gate (L_MIN_MS) lives in the Engine;
* double buffering is explicit: `run_forever` keeps ONE step in flight
  (Engine.dispatch / Engine.collect) -- while the device chews batch N,
  the host assembles and dispatches batch N+1, syncing batch N only when
  its successor is already launched (the reference's implicit CPU/GPU
  pipelining, made real; SURVEY.md §7 step 6).
"""

from __future__ import annotations

import threading
import time
from typing import TYPE_CHECKING, Callable

import numpy as np

if TYPE_CHECKING:  # annotation-only: a module-level import would make
    # `import ...service` fail (service.engine -> runtime -> scheduler cycle)
    from video_stream_segmenetation_tpu.service.engine import Engine


class StreamScheduler:
    def __init__(
        self,
        engine: Engine,
        use_native_pool: bool = True,
        tick_hz: float = 30.0,
        groups: int = 1,
        group_sizes: "list[int] | None" = None,
        frame_source: "Callable[[int, int], object] | None" = None,
        fused_rounds: bool = False,
    ):
        """groups > 1 = latency mode: each tick serves ONE group of
        S/groups streams round-robin at ``groups * tick_hz`` ticks/s, so
        per-frame compute latency is a small-batch step (5.4 ms at S/G=16
        on v5e vs 21.4 ms full-batch; benchmarks/RESULTS.md) while
        throughput stays at S streams.

        ``group_sizes`` = heterogeneous rotation: explicit per-group
        stream counts (must sum to num_streams; overrides ``groups``).
        Unequal groups pack a chip to capacity when the per-stream sweet
        spot doesn't divide the budget evenly -- on v5e the measured
        optimum is 4x96 + 1x16 = 400 streams per 33.33 ms frame interval
        (benchmarks/RESULTS.md batch sweep: 96 is the per-stream-cost
        knee, and one 16-stream step fits the leftover ~2 ms).

        ``frame_source``: optional ``(i0, i1) -> frames`` callback that
        replaces the pool/host-array ingest -- for deployments whose
        frames are already device-resident (on-device decode DMA) and
        for capacity benches that must not measure host staging.  The
        returned value is fed to the engine step as-is (natural, packed,
        or (packed, lanes)).

        ``fused_rounds``: dispatch each full rotation round as ONE
        jitted program (Engine.dispatch_round) instead of one dispatch
        per group -- the device overlaps the groups' independent stages
        (4x96: ~25 ms vs ~32 per-group, benchmarks/RESULTS.md round 4)
        and the per-tick host/transport overhead is paid once per frame
        interval.  Results still arrive one round late (double
        buffering); knobs and the face min-interval clock advance per
        round instead of per tick."""
        self.engine = engine
        self.frame_source = frame_source
        if group_sizes is not None:
            if any(g <= 0 for g in group_sizes):
                raise ValueError("group_sizes must be positive")
            if sum(group_sizes) != engine.num_streams:
                raise ValueError(
                    f"group_sizes sum {sum(group_sizes)} != num_streams "
                    f"{engine.num_streams}"
                )
            groups = len(group_sizes)
            offs = [0]
            for g in group_sizes:
                offs.append(offs[-1] + g)
        else:
            if engine.num_streams % groups:
                raise ValueError("groups must divide num_streams")
            gs = engine.num_streams // groups
            offs = [i * gs for i in range(groups + 1)]
        self.groups = groups
        self.group_offsets = offs
        self.fused_rounds = fused_rounds
        self.tick_s = 1.0 / (tick_hz * groups)
        fh, fw = engine.statics.frame_hw
        self.pool = None
        if use_native_pool:
            try:
                from video_stream_segmenetation_tpu.runtime.native import FramePool

                # s2d engines take packed batches straight from the pool
                blk = (
                    engine.statics.s2d_block
                    if engine.statics.frame_layout == "s2d"
                    else 0
                )
                sel = None
                if blk and engine.statics.guide_source == "host":
                    # the pool emits the guide tap lanes during its pack
                    # (pipeline guide_source='host'): the step takes
                    # (packed, lanes) and never re-reads the frames
                    from video_stream_segmenetation_tpu import ops as _ops

                    sel = _ops.guide_s2d_sel(
                        (fh, fw), engine.statics.mask_hw, blk, planar=True
                    )
                # Fused rounds assemble EVERY group before one dispatch and
                # collect a round late, so all G views (and their lanes)
                # must survive a full round of further assembles: ring
                # depth 2*G.  Per-group modes keep at most one step in
                # flight -- classic depth-2 double buffering suffices.
                self.pool = FramePool(
                    engine.num_streams, fh, fw, s2d_block=blk,
                    guide_lanes=sel,
                    depth=(2 * groups) if fused_rounds else 2,
                )
            except Exception:
                self.pool = None  # fall back to host-side arrays
        self._frames = np.zeros((engine.num_streams, fh, fw, 3), np.uint8)
        self._running = False
        self._thread: threading.Thread | None = None
        self.on_batch: Callable[[dict, np.ndarray], None] | None = None
        self.ticks = 0
        self._inflight: dict | None = None  # double-buffered pipelining

    # ---- stream lifecycle with staggered cadence ----------------------
    def admit(self) -> int:
        slot = self.engine.admit()
        interval = self.engine.statics.lmk_interval
        phase = slot % interval
        # stagger: initial frame_idx = phase, so cadence (idx % interval
        # == 0) fires for ~S/interval streams per step
        self.engine.state.frame_idx = (
            self.engine.state.frame_idx.at[slot].set(phase)
        )
        return slot

    def admit_all(self) -> "list[int]":
        """Bulk admission with staggered cadence phases: one vectorized
        phase write instead of S per-slot updates (Engine.admit_all)."""
        slots = self.engine.admit_all()
        if not slots:
            return slots
        interval = self.engine.statics.lmk_interval
        import jax.numpy as jnp

        S = self.engine.num_streams
        mask = np.zeros((S,), bool)
        mask[slots] = True
        phases = (np.arange(S) % interval).astype(np.int32)
        self.engine.state.frame_idx = jnp.where(
            jnp.asarray(mask), jnp.asarray(phases),
            self.engine.state.frame_idx,
        )
        return slots

    def evict(self, slot: int) -> None:
        self.engine.evict(slot)

    # ---- frame ingestion ----------------------------------------------
    def push_frame(self, slot: int, frame: np.ndarray) -> None:
        if self.pool is not None:
            self.pool.push_rgb(slot, frame)
        else:
            self._frames[slot] = frame

    def push_i420(self, slot: int, y, u, v) -> None:
        if self.pool is None:
            raise RuntimeError("native pool unavailable")
        self.pool.push_i420(slot, y, u, v)

    # ---- the tick ------------------------------------------------------
    def _group_frames(self, i0: int, i1: int, copy: bool = False):
        """Ingest one group's frames: the ``frame_source`` callback if
        set (device-resident deployments), else a ranged native-pool
        assemble, else the host-array fallback.  ``copy=True`` detaches
        the host-array fallback from future mutation (pipelined mode;
        the pool's double buffer makes its views safe at depth 1)."""
        if self.frame_source is not None:
            return self.frame_source(i0, i1), None
        if self.pool is not None:
            # ranged assemble: pack only this group's rows (the full-
            # batch assemble at groups x the tick rate would re-copy
            # (groups-1)/groups of the frames just to discard them)
            gbatch, ids = self.pool.assemble_range(i0, i1)
            if self.pool.num_lanes:
                gbatch = (gbatch, self.pool.lanes())
            return gbatch, ids
        gb = self._frames[i0:i1]
        return (gb.copy() if copy else gb), None

    def step(self) -> dict:
        """Assemble the freshest frames and run one engine step.

        With ``groups > 1`` only the current round-robin group's rows are
        stepped (latency mode); its result carries the ``slots`` range.
        """
        if self.groups > 1:
            g = self.ticks % self.groups
            i0, i1 = self.group_offsets[g], self.group_offsets[g + 1]
            gbatch, ids = self._group_frames(i0, i1)
            out = self.engine.process_range(i0, i1, gbatch)
        elif self.frame_source is not None:
            batch, ids = self._group_frames(0, self.engine.num_streams)
            out = self.engine.process(batch)
        else:
            if self.pool is not None:
                batch, ids = self.pool.assemble()
                if self.pool.num_lanes:
                    batch = (batch, self.pool.lanes())
            else:
                batch, ids = self._frames, None
            out = self.engine.process(batch)
        self.ticks += 1
        if self.on_batch is not None:
            self.on_batch(out, ids)
        return out

    def step_pipelined(self) -> dict | None:
        """Double-buffered tick: dispatch this tick's batch, then collect
        the PREVIOUS tick's results -- host assembly of batch N+1 overlaps
        device compute of batch N (Engine.dispatch/collect).  Returns the
        previous batch's results (None on the priming tick).

        With ``groups > 1`` each tick dispatches ONE group
        (Engine.dispatch_range) and collects the previous group -- the
        rotation keeps one group step in flight, so the round period is
        the sum of device step times, not step + host overhead per
        group.  Group N's results therefore arrive one tick late, same
        as the full-batch pipelining."""
        if self.groups > 1:
            g = self.ticks % self.groups
            i0, i1 = self.group_offsets[g], self.group_offsets[g + 1]
            gbatch, ids = self._group_frames(i0, i1, copy=True)
            token = self.engine.dispatch_range(i0, i1, gbatch)
        else:
            if self.frame_source is not None:
                batch, ids = self._group_frames(0, self.engine.num_streams)
            elif self.pool is not None:
                # the pool's double buffer alternates, so batch N stays
                # valid while N+1 assembles into the other buffer: safe
                # at depth 1
                batch, ids = self.pool.assemble()
                if self.pool.num_lanes:
                    batch = (batch, self.pool.lanes())
            else:
                # host-array fallback: jnp.asarray may alias numpy memory
                # (CPU zero-copy); copy so the next tick's mutation cannot
                # race the in-flight step
                batch, ids = self._frames.copy(), None
            token = self.engine.dispatch(batch)
        token["ids"] = ids
        prev, self._inflight = self._inflight, token
        self.ticks += 1
        if prev is None:
            return None
        out = self.engine.collect(prev)
        if self.on_batch is not None:
            self.on_batch(out, prev.get("ids"))
        return out

    def step_round(self) -> "list[dict] | None":
        """Fused-round tick: assemble EVERY group's frames, dispatch the
        whole rotation round as one program (Engine.dispatch_round),
        then collect the PREVIOUS round's per-group results (None on the
        priming round)."""
        frames_list, ids_list = [], []
        sizes = []
        for g in range(self.groups):
            i0, i1 = self.group_offsets[g], self.group_offsets[g + 1]
            fb, ids = self._group_frames(i0, i1, copy=True)
            frames_list.append(fb)
            ids_list.append(ids)
            sizes.append(i1 - i0)
        token = self.engine.dispatch_round(sizes, frames_list)
        token["ids"] = ids_list
        prev, self._inflight = self._inflight, token
        self.ticks += self.groups
        if prev is None:
            return None
        outs = self.engine.collect_round(prev)
        if self.on_batch is not None:
            pids = prev.get("ids") or [None] * len(outs)
            for r, ids in zip(outs, pids):
                self.on_batch(r, ids)
        return outs

    def drain(self) -> "dict | list[dict] | None":
        """Collect the in-flight step, if any (end-of-loop flush).

        Returns the in-flight step's result dict -- or, when the in-flight
        token is a fused ROUND, the full list of per-group result dicts
        (matching what step_round would have returned next tick)."""
        token, self._inflight = self._inflight, None
        if token is None:
            return None
        if token.get("round"):
            outs = self.engine.collect_round(token)
            if self.on_batch is not None:
                pids = token.get("ids") or [None] * len(outs)
                for r, ids in zip(outs, pids):
                    self.on_batch(r, ids)
            return outs
        out = self.engine.collect(token)
        if self.on_batch is not None:
            self.on_batch(out, token.get("ids"))
        return out

    def run_forever(self) -> None:
        """The serving loop: pipelined ticks paced PER ROUND.

        Pacing is per round (one full pass over all groups), not per
        tick: groups run back-to-back and the loop sleeps only to keep
        round starts ``1/tick_hz`` apart.  Uniform per-tick slots would
        cap a heterogeneous rotation below the frame rate -- with
        4x96+16 the ~8 ms big-group steps overrun a 33.33/5 ms slot
        while the ~2 ms remainder group still slept out its full slot,
        making the round period sum(big steps) + slot > budget even
        though the measured round fits it."""
        self._running = True
        round_s = self.tick_s * self.groups  # = 1 / tick_hz
        next_round = time.monotonic()
        while self._running:
            if self.fused_rounds:
                self.step_round()
            else:
                for _ in range(self.groups):
                    if not self._running:
                        break
                    self.step_pipelined()
            next_round += round_s
            delay = next_round - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            else:
                next_round = time.monotonic()  # fell behind; don't spiral
        self.drain()

    def start(self) -> None:
        self._thread = threading.Thread(target=self.run_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None
        if self.pool is not None:
            self.pool.close()
