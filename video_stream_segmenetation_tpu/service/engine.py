"""Engine: the stateful multi-stream serving loop.

The TPU-native replacement for the reference's frame-loop orchestrator
(run()/loop(), client/src/core/main.ts:24-115): instead of one rAF-paced
stream with a promise mutex, the engine owns S stream slots, batches their
latest frames into one ``[S, H, W, 3]`` device step, and carries all
per-stream state (EMA accumulator, affine, cadence counters, knobs,
backgrounds) as device arrays.

Concurrency policy (SURVEY.md §5 race detection): the reference accepts a
benign race where the UI mutates `config` mid-frame (script.ts:20-25); here
that is made explicit -- knob/background updates are staged host-side and
snapshotted once per step, so a step always sees a consistent config.
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.models.registry import get_spec
from video_stream_segmenetation_tpu.runtime.config import PipelineStatics
from video_stream_segmenetation_tpu.service.counters import Counters
from video_stream_segmenetation_tpu.service.health import EngineHealth, HealthMonitor

# ---- device-resident face-gate bookkeeping (async serving paths) ------
# The pipelined dispatch/collect rotation must not touch the host per
# tick: reading back out['face_applied'] to update a host-side
# last-face-at array costs one device->host sync per tick, which is free
# on local PCIe but IS the serving loop's critical path at scale (and
# measurably so over this image's tunnel: ~44 ms/sync vs an ~8 ms step).
# The async paths keep last-face-at ON DEVICE ([S] f32 seconds, rebased
# to the engine epoch so f32 resolution stays sub-ms) and update it with
# the step's own face_applied output -- zero readbacks; the synchronous
# process() paths keep the host array (they materialize results anyway).
import functools as _ft


@_ft.partial(jax.jit, static_argnums=(1,))
def _face_gate_dev(last, gs, i0, now, min_interval):
    cur = jax.lax.dynamic_slice_in_dim(last, i0, gs)
    return (now - cur) >= min_interval


@jax.jit
def _face_update_dev(last, i0, applied, now):
    cur = jax.lax.dynamic_slice_in_dim(last, i0, applied.shape[0])
    upd = jnp.where(applied, now.astype(cur.dtype), cur)
    return jax.lax.dynamic_update_slice_in_dim(last, upd, i0, axis=0)


@jax.jit
def _face_reset_dev(last, mask):
    return jnp.where(mask, jnp.float32(-1e9), last)


class Engine:
    def __init__(
        self,
        num_streams: int,
        statics: PipelineStatics | None = None,
        bundle: runtime.ModelBundle | None = None,
        rng_seed: int = 0,
        donate_state: bool = True,
        mesh=None,
        output_layout: str = "natural",
        collect_sync: bool = True,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` (parallel.make_mesh) turns
        this engine multi-device: params replicate, every per-stream
        array (state, knobs, backgrounds, frames) shards its leading
        stream axis over the mesh 'data' axis, and the SAME jitted step
        serves all devices -- streams are independent, so the compiled
        module has zero hot-loop collectives (parallel/mesh.py).  All
        serving paths (process / dispatch+collect / ranged) and the
        admission/knob-staging plumbing work unchanged: eager per-slot
        updates write through the sharded arrays, and jit propagates
        operand shardings (SURVEY.md §2.10 / §7 step 8)."""
        self.num_streams = num_streams
        self.statics = statics or PipelineStatics()
        self.mesh = mesh
        if mesh is not None:
            from video_stream_segmenetation_tpu import parallel

            n_data = mesh.shape[parallel.DATA_AXIS]
            if num_streams % n_data:
                raise ValueError(
                    f"num_streams {num_streams} must divide over the "
                    f"mesh 'data' axis ({n_data} devices)"
                )
        if bundle is None:
            bundle = self._default_bundle(rng_seed)
        self.bundle = bundle
        # keep the float model/params for re-quantization on checkpoint load
        self._raw_matte = (bundle.matte_model, bundle.matte_params)
        if self.statics.matting_precision == "int8":
            self._swap_in_quantized()
        self._raw_face = (
            bundle.face_model, bundle.face_params,
            bundle.lmk_model, bundle.lmk_params,
        )
        if self.statics.face_precision == "int8":
            self._swap_in_quantized_face()
        self._donate = (1,) if donate_state else ()
        self._build_steps()
        if self.statics.face_models == "reference":
            # serve the reference repo's real shipped MediaPipe weights
            # (statics tier-1 flag; preset 'fast_int8_pico_refface') --
            # the swap rebuilds the jitted steps itself
            self.use_reference_face_models()
        # per-stream-safe failure recovery (SURVEY.md §5): with donation
        # the pre-step buffers are gone when an async device failure
        # surfaces at collect time, so the engine keeps a host-side
        # snapshot of the CHEAP per-stream state (affine, cadence
        # counters, face centers -- ~50 B/stream) every
        # ``snapshot_every`` dispatches, copied host-ward asynchronously
        # so the serving loop never blocks on it.  On failure the
        # affected batch restarts from the snapshot: face tracking and
        # cadence phase survive, only the EMA re-warms (first-frame-copy
        # semantics).  ``state_snapshot_every`` > 0 additionally
        # snapshots the FULL state (EMA included, 576 KB/stream) at that
        # cadence for deployments that can afford the host traffic.
        self.snapshot_every = 8
        self.state_snapshot_every = 0
        self._dispatches = 0
        self._snap: dict | None = None
        self._snap_pending: dict | None = None
        self._snap_copy = jax.jit(
            lambda t: jax.tree_util.tree_map(jnp.copy, t)
        )
        # cheap-snapshot single-buffer packer (built lazily; f32 carries
        # frame_idx exactly up to 2^24 frames ~ 6 days at 30 fps; past
        # that a recovery may shift cadence phase by a frame -- harmless)
        self._cheap_pack_fn = None
        self._cheap_spec = None

        mh, mw = self.statics.mask_hw
        fh, fw = self.statics.frame_hw
        rec = ()
        if self.statics.matting_arch == "recurrent":
            from video_stream_segmenetation_tpu.models.rvm import (
                init_state as rvm_init_state,
            )

            rec = rvm_init_state(num_streams, (mh, mw))
        elif self.statics.num_classes > 1:
            # multiclass mode keeps the smoothed class maps in rec
            rec = jnp.zeros(
                (num_streams, mh, mw, self.statics.num_classes), jnp.float32
            )
        self.state = runtime.init_state(num_streams, (mh, mw), rec=rec)
        self.knobs = runtime.default_knobs(
            num_streams, ema_adapt=statics.ema_adapt_default
        )
        # stored uint8: 4x less HBM traffic per composite; converted
        # on the fly inside the fused step.  In s2d mode backgrounds are
        # cached pre-packed so the step never pays a layout conversion.
        if self.statics.frame_layout == "s2d":
            blk = self.statics.s2d_block
            self.backgrounds = jnp.zeros(
                (num_streams, fh // blk, fw // blk, blk * blk * 3), jnp.uint8
            )
        else:
            self.backgrounds = jnp.zeros((num_streams, fh, fw, 3), jnp.uint8)
        self._last_face_at = np.zeros((num_streams,), np.float64)
        self.face_min_interval_s = 0.180  # L_MIN_MS (main.ts:11)
        # async-path device mirror of _last_face_at (module docstring at
        # _face_gate_dev): seconds rebased to the engine epoch; lazily
        # built on first dispatch, then updated purely on device
        self._face_epoch = time.monotonic()
        self._face_last_dev = None
        # per-tick scalar-upload caches: the ranged program takes (now,
        # min_interval) as device scalars; uploading fresh ones per tick
        # costs ~0.5 ms each over slow transports for no benefit.  'now'
        # is quantized to 25 ms buckets (the min-interval gate's own
        # tolerance class -- the reference's rAF timing jitters more) so
        # the cached scalar refreshes at most once per frame interval.
        self._now_bucket: int | None = None
        self._now_dev = None
        self._mi_cache: tuple | None = None

        # s2d ingestion: the step consumes space-to-depth packed frames
        # (ops/layout.py); natural-layout input to process() is packed
        # here (the native framebuf delivers packed batches directly)
        if self.statics.frame_layout == "s2d":
            from video_stream_segmenetation_tpu import ops as _ops

            blk = self.statics.s2d_block
            self._pack_frames = jax.jit(lambda f: _ops.space_to_depth(f, blk))
            self._unpack_frames = jax.jit(lambda f: _ops.depth_to_space(f, blk))
        else:
            self._pack_frames = None
            self._unpack_frames = None
        # output_layout='packed': serve the composited frames in the s2d
        # packed layout the step emits.  The production consumer is the
        # native encode stage (runtime/native.py unpacks during its copy,
        # for free); the default 'natural' unpacks on device for API
        # convenience -- a full-batch depth_to_space, ~the single most
        # expensive relayout XLA can be asked for at S=96x720p, so a
        # capacity deployment MUST serve packed (bench.py measures the
        # packed production rotation for exactly this reason).
        if output_layout not in ("natural", "packed"):
            raise ValueError(f"unknown output_layout {output_layout!r}")
        if output_layout == "packed":
            self._unpack_frames = None
        # collect_sync=False: collect()/collect_range() return results as
        # device FUTURES instead of blocking on step completion.  The
        # device already serializes the rotation through the donated
        # state's data dependence; waiting is the CONSUMER's choice (the
        # native encode stage forces it when it reads the frames), and a
        # per-tick wait in the scheduler costs one host round trip per
        # tick for nothing.  Trade-off: an async device failure surfaces
        # at the next materialization point (a later collect, stats read,
        # or the consumer) instead of the same tick -- the recovery path
        # is identical.
        self._collect_sync = collect_sync
        # guide_source='host': the step consumes (packed, guide_lanes)
        # (pipeline.py host_lanes; production lanes come from the native
        # framebuf's pack pass, FramePool(guide_lanes=...)).  The
        # device-side lanes gather here covers convenience callers that
        # pass natural/packed arrays.
        self._make_lanes = None
        if (
            self.statics.frame_layout == "s2d"
            and self.statics.guide_source == "host"
        ):
            from video_stream_segmenetation_tpu import ops as _ops

            blk = self.statics.s2d_block
            fhw, mhw = self.statics.frame_hw, self.statics.mask_hw
            self._make_lanes = jax.jit(
                lambda f: _ops.guide_lanes_s2d(f, fhw, mhw, blk)[0]
            )

        if mesh is not None:
            self._place_on_mesh()
        self.active = np.zeros((num_streams,), bool)
        self.counters = Counters()
        self.health = HealthMonitor()
        self._lock = threading.Lock()
        # staged knob updates coalesce per slot (last-writer-wins per key),
        # so a chatty control plane costs at most one update per slot per
        # step -- the explicit version of the reference's benign
        # config-write race (script.ts:20-25, SURVEY.md §5)
        self._staged_knobs: dict[int, dict] = {}

    # ---- construction -------------------------------------------------
    def _place_on_mesh(self) -> None:
        """Place the engine's arrays for mesh serving: params replicated
        (the startup weight broadcast -- the only collective), per-stream
        trees sharded over 'data'.  Called at construction and after any
        param load that rebuilds the bundle."""
        from video_stream_segmenetation_tpu import parallel

        mesh = self.mesh
        b = self.bundle
        b.matte_params = parallel.replicate_tree(mesh, b.matte_params)
        if b.face_params is not None:
            b.face_params = parallel.replicate_tree(mesh, b.face_params)
        if b.lmk_params is not None:
            b.lmk_params = parallel.replicate_tree(mesh, b.lmk_params)
        self.state = parallel.shard_stream_tree(mesh, self.state)
        self.knobs = parallel.shard_stream_tree(mesh, self.knobs)
        if self.backgrounds.shape[0] == self.num_streams:
            self.backgrounds = parallel.shard_stream_tree(
                mesh, self.backgrounds
            )
        self._stream_put = lambda x: jax.device_put(
            x, parallel.stream_sharding(mesh, getattr(x, "ndim", 1))
        )

    def _build_steps(self) -> None:
        """(Re)build the jitted serving programs: the plain batch step and
        the ranged group step (in-jit dynamic slice/update over the full
        donated state -- runtime.make_range_step)."""
        self._step = jax.jit(
            runtime.make_step(self.bundle, self.statics),
            donate_argnums=self._donate,
        )
        self._range_step = jax.jit(
            runtime.make_range_step(self.bundle, self.statics),
            donate_argnums=self._donate,
            static_argnames=("gs",),
        )
        # fused-round programs, cached per schedule (built on demand)
        self._round_steps = {}
        # param loaders rebuild the bundle: re-place it on the mesh
        if self.mesh is not None and hasattr(self, "state"):
            self._place_on_mesh()

    def _round_step_for(self, group_sizes):
        key = tuple(int(g) for g in group_sizes)
        rs = self._round_steps.get(key)
        if rs is None:
            rs = jax.jit(
                runtime.make_round_step(self.bundle, self.statics,
                                        list(key)),
                donate_argnums=self._donate,
            )
            self._round_steps[key] = rs
        return rs

    def _default_bundle(self, seed: int) -> runtime.ModelBundle:
        """Build the default model bundle with params initialized ON THE
        HOST (cpu backend) and returned as numpy trees.

        Two reasons, both tunnel-shaped (ARCHITECTURE.md perf notes):
        eager flax ``init`` on a remote device is one HTTP dispatch per
        op, and the int8 quantizer reads the float tree back to host --
        a device->host path measured in KB/s on axon (a 5 MB pico tree
        stalled >10 min).  Host params upload exactly once, at the first
        jitted step call.  When no cpu backend exists the inits run on
        the default device as before."""
        try:
            _cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            _cpu = None
        if _cpu is not None and jax.default_backend() != "cpu":
            with jax.default_device(_cpu):
                b = self._init_bundle_models(seed)
            import numpy as _np

            return runtime.ModelBundle(
                b.matte_model,
                jax.tree_util.tree_map(_np.asarray, b.matte_params),
                b.face_model,
                jax.tree_util.tree_map(_np.asarray, b.face_params),
                b.lmk_model,
                jax.tree_util.tree_map(_np.asarray, b.lmk_params),
            )
        return self._init_bundle_models(seed)

    def _init_bundle_models(self, seed: int) -> runtime.ModelBundle:
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        mh, mw = self.statics.mask_hw
        fh, fw = self.statics.frame_hw
        from video_stream_segmenetation_tpu import models

        if self.statics.num_classes > 1:
            if self.statics.matting_input == "native":
                # multiclass fast stack: HD trunk, K-class heads
                ss = self.statics.s2d_block
                stem_hw = (-(-fh // ss), -(-fw // ss))
                uf = max(1, mh // stem_hw[0])
                matte = models.MatteNetHD(
                    stem_stride=ss, head_upsample=uf,
                    num_classes=self.statics.num_classes,
                    decoder=self.statics.matting_decoder,
                )
                matte_p = matte.init(k1, jnp.zeros((1, fh, fw, 3)))
            else:
                matte = models.MatteNet(num_classes=self.statics.num_classes)
                matte_p = matte.init(k1, jnp.zeros((1, mh, mw, 3)))
        elif self.statics.matting_arch == "recurrent":
            from video_stream_segmenetation_tpu.models.rvm import (
                init_state as rvm_init_state,
            )

            matte = models.RecurrentMatteNet()
            matte_p = matte.init(
                k1, jnp.zeros((1, mh, mw, 3)), rvm_init_state(1, (mh, mw))
            )
        elif self.statics.matting_arch == "saliency":
            # U2Net-class saliency variant (u2FrameProc.ts): canonical
            # square input at mask resolution
            matte = models.SaliencyNet()
            matte_p = matte.init(k1, jnp.zeros((1, mh, mw, 3)))
        elif self.statics.matting_input == "native":
            ss = self.statics.s2d_block
            stem_hw = (-(-fh // ss), -(-fw // ss))
            uf = max(1, mh // stem_hw[0])
            if (uf * stem_hw[0], uf * stem_hw[1]) != (mh, mw):
                raise ValueError(
                    f"native matting: mask_hw must be an integer multiple "
                    f"of the stem grid ceil(frame/{ss}) = {stem_hw}, got "
                    f"{(mh, mw)}"
                )
            matte = models.MatteNetHD(
                stem_stride=ss, head_upsample=uf,
                decoder=self.statics.matting_decoder,
            )
            matte_p = matte.init(k1, jnp.zeros((1, fh, fw, 3)))
        else:
            matte = models.MatteNet()
            matte_p = matte.init(k1, jnp.zeros((1, mh, mw, 3)))
        face = models.FaceFinder(input_size=self.statics.fd_size)
        face_p = face.init(
            k2, jnp.zeros((1, self.statics.fd_size, self.statics.fd_size, 3))
        )
        lmk = models.LandmarkNet()
        lmk_p = lmk.init(
            k3, jnp.zeros((1, self.statics.lmk_size, self.statics.lmk_size, 3))
        )
        return runtime.ModelBundle(matte, matte_p, face, face_p, lmk, lmk_p)

    def _swap_in_quantized(self) -> None:
        """Replace the bundle's matting forward with the int8 serving
        graph built from the current float params (models/quantized.py)."""
        from video_stream_segmenetation_tpu.models.quantized import (
            QuantizedMatteNetHD,
            quantize_mattenet_hd,
        )

        model, params = self._raw_matte
        self.bundle.matte_params = quantize_mattenet_hd(model, params)
        self.bundle.matte_model = QuantizedMatteNetHD(
            stem_stride=model.stem_stride,
            head_upsample=model.head_upsample,
            num_classes=model.num_classes,
            decoder=getattr(model, "decoder", "full"),
            conv_impl=self.statics.int8_conv_impl,
            decoder_impl=self.statics.int8_decoder_impl,
            stem_impl=self.statics.int8_stem_impl,
            head_impl=self.statics.int8_head_impl,
            trunk_fold=self.statics.int8_trunk_fold,
        )

    def _swap_in_quantized_face(self) -> None:
        """Replace the face-subpath forwards with the int8 serving graphs
        built from the current float params (models/quantized_face.py)."""
        from video_stream_segmenetation_tpu.models.quantized_face import (
            QuantizedFaceFinder,
            QuantizedLandmarkNet,
            quantize_face_finder,
            quantize_landmark_net,
        )

        fd, fd_p, lm, lm_p = self._raw_face
        self.bundle.face_params = quantize_face_finder(fd, fd_p)
        self.bundle.face_model = QuantizedFaceFinder(input_size=fd.input_size)
        self.bundle.lmk_params = quantize_landmark_net(lm, lm_p)
        self.bundle.lmk_model = QuantizedLandmarkNet()

    def load_face_params(self, face_path: str, lmk_path: str | None = None) -> None:
        """Load FaceFinder / LandmarkNet weights (tools/train_face.py
        checkpoints) -- the counterpart of the reference's pretrained
        MediaPipe face ONNX files (SURVEY.md §2.7)."""
        from video_stream_segmenetation_tpu.utils.checkpoint import restore_params
        from video_stream_segmenetation_tpu import models

        fd_model, lm_model = self._raw_face[0], self._raw_face[2]
        if not isinstance(fd_model, models.FaceFinder):
            # a prior use_reference_face_models() swap left ONNX-graph
            # models in place; these checkpoints are fast-model params,
            # so reinstall the fast model classes alongside them.  The
            # landmark pair is only swapped when its params come too --
            # otherwise the reference lmk model+params stay consistent.
            fd_model = models.FaceFinder(input_size=self.statics.fd_size)
            self.bundle.face_model = fd_model
            if lmk_path is not None:
                lm_model = models.LandmarkNet()
                self.bundle.lmk_model = lm_model
            # the jitted steps traced the reference graphs; rebuild them
            self._build_steps()
        self.bundle.face_params = restore_params(face_path)
        if lmk_path is not None:
            self.bundle.lmk_params = restore_params(lmk_path)
        self._raw_face = (
            fd_model, self.bundle.face_params,
            lm_model,
            restore_params(lmk_path) if lmk_path is not None
            else self._raw_face[3],
        )
        if self.statics.face_precision == "int8":
            self._swap_in_quantized_face()

    def use_reference_face_models(self) -> None:
        """Swap in the reference's REAL shipped face weights (the
        MediaPipe ONNX files the reference commits, SURVEY.md §2.7) for
        the face subpath: exact-parity detection/landmarks at some speed
        cost vs the fast dense-conv serving models.  Weights come from
        checkpoints/face_ref/ (tools/import_reference_weights.py)."""
        from video_stream_segmenetation_tpu.models.reference_face import (
            ReferenceFaceFinder,
            ReferenceLandmarkNet,
        )

        fd = ReferenceFaceFinder()
        lm = ReferenceLandmarkNet()
        if (
            self.statics.fd_size != fd.input_size
            or self.statics.lmk_size != lm.input_size
        ):
            raise ValueError(
                f"reference face graphs need fd_size={fd.input_size} / "
                f"lmk_size={lm.input_size} (statics has "
                f"{self.statics.fd_size}/{self.statics.lmk_size}); build "
                f"the Engine with matching statics before swapping"
            )
        self.bundle.face_model = fd
        self.bundle.face_params = jax.device_put(fd.init_params())
        self.bundle.lmk_model = lm
        self.bundle.lmk_params = jax.device_put(lm.init_params())
        # keep _raw_face consistent: a later load_face_params must not
        # re-quantize stale fast-model params over this swap
        self._raw_face = (
            fd, self.bundle.face_params, lm, self.bundle.lmk_params
        )
        if self.statics.face_precision == "int8":
            import warnings

            warnings.warn(
                "face_precision='int8' does not apply to the reference "
                "ONNX face graphs; serving them in float", stacklevel=2
            )
        self._build_steps()

    def load_matting_params(self, path: str) -> None:
        """Load flagship matting weights from an orbax checkpoint dir
        (service start = checkpoint read, SURVEY.md §5).  The param tree
        must match the configured matting architecture."""
        from video_stream_segmenetation_tpu.utils.checkpoint import restore_params

        params = restore_params(path)
        self._raw_matte = (self._raw_matte[0], params)
        if self.statics.matting_precision == "int8":
            self._swap_in_quantized()
        else:
            self.bundle.matte_params = params

    # ---- stream admission (SURVEY.md §5 failure/recovery) -------------
    def admit(self) -> int:
        """Take a free slot; cold-start its state.  Returns the slot id."""
        with self._lock:
            free = np.flatnonzero(~self.active)
            if free.size == 0:
                raise RuntimeError("engine full: no free stream slots")
            s = int(free[0])
            self.active[s] = True
        self.state = runtime.reset_stream(self.state, s)
        self._last_face_at[s] = 0.0
        if self._face_last_dev is not None:
            mask = np.zeros((self.num_streams,), bool)
            mask[s] = True
            self._face_last_dev = _face_reset_dev(
                self._face_last_dev, jnp.asarray(mask)
            )
        return s

    def admit_all(self) -> list[int]:
        """Activate every free slot at once (bulk onboarding, e.g. a
        chip taking over a 400-stream shard): ONE fused state reset
        instead of S sequential per-slot resets.  Returns the slots."""
        with self._lock:
            free = np.flatnonzero(~self.active)
            self.active[:] = True
        if free.size:
            mask = np.zeros((self.num_streams,), bool)
            mask[free] = True
            self.state = runtime.reset_streams(self.state, jnp.asarray(mask))
            self._last_face_at[free] = 0.0
            if self._face_last_dev is not None:
                self._face_last_dev = _face_reset_dev(
                    self._face_last_dev, jnp.asarray(mask)
                )
        return [int(s) for s in free]

    def evict(self, slot: int) -> None:
        with self._lock:
            self.active[slot] = False
        self.state = runtime.reset_stream(self.state, slot)

    # ---- live config tier (script.ts slider semantics) ----------------
    def set_knobs(self, slot: int, **kw) -> None:
        """Stage per-stream knob updates; applied at the next step
        boundary (config snapshot per batch, SURVEY.md §5 races)."""
        with self._lock:
            self._staged_knobs.setdefault(slot, {}).update(kw)

    def reset_knobs(self, slot: int) -> None:
        """Object.assign(config, defaultConfig) equivalent (script.ts:43-46)."""
        from video_stream_segmenetation_tpu.runtime import config as cfg

        self.set_knobs(
            slot,
            ema=cfg.DEFAULT_EMA,
            ema_adapt=self.statics.ema_adapt_default,
            noise_cutoff=cfg.DEFAULT_NOISE_CUTOFF,
            high_threshold=cfg.DEFAULT_HIGH_THRESHOLD,
            gamma=cfg.DEFAULT_GAMMA,
            use_bilateral=cfg.DEFAULT_USE_BILATERAL,
            sigma_spatial=cfg.DEFAULT_BILATERAL_SIGMA_SPATIAL,
            sigma_range=cfg.DEFAULT_BILATERAL_SIGMA_RANGE,
        )

    def set_background(self, slot: int, image) -> None:
        """Set a stream's replacement background (uint8 or float RGB, any
        size; resized on device once here, cached across steps)."""
        from video_stream_segmenetation_tpu import ops

        img = jnp.asarray(image)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        fh, fw = self.statics.frame_hw
        if img.shape[:2] != (fh, fw):
            img = ops.resize_bilinear(img, (fh, fw), method="half_pixel")
        img_u8 = jnp.clip(jnp.floor(img * 255.0 + 0.5), 0, 255).astype(jnp.uint8)
        if self._pack_frames is not None:
            img_u8 = ops.space_to_depth(img_u8, self.statics.s2d_block)
        self.backgrounds = self.backgrounds.at[slot].set(img_u8)

    def _apply_staged(self):
        with self._lock:
            staged, self._staged_knobs = self._staged_knobs, {}
        for slot, kw in staged.items():
            self.knobs = self.knobs.replace_stream(slot, **{
                k: jnp.asarray(v) for k, v in kw.items()
            })

    def _ingest(self, frames, rows: int | None = None):
        """Normalize step input.  Returns (frames_in, step_frames):
        frames_in is the array used for passthrough output; step_frames is
        what the jitted step consumes -- a (packed, guide_lanes) tuple when
        guide_source='host' (lanes from the native framebuf pack pass, or
        gathered on device here for convenience callers).

        ``rows``: the batch's stream-row count when it is a GROUP rather
        than the full stream set (ranged serving).  A group need not be
        divisible by the mesh's data axis (4x96+16 on an 8-way mesh), so
        group batches are left uncommitted and the jitted range step's
        sharding propagation places them; only full batches get the
        explicit stream sharding."""
        full = rows is None or rows == self.num_streams
        put = (
            self._stream_put
            if (self.mesh is not None and full)
            else (lambda x: x)
        )
        if isinstance(frames, tuple):
            packed = put(jnp.asarray(frames[0], dtype=jnp.uint8))
            lanes = put(jnp.asarray(frames[1], dtype=jnp.uint8))
            return packed, (packed, lanes)
        frames_in = put(jnp.asarray(frames, dtype=jnp.uint8))
        fj = frames_in
        if self._pack_frames is not None and fj.shape[-1] == 3:
            fj = self._pack_frames(fj)
        if self._make_lanes is not None:
            return frames_in, (fj, self._make_lanes(fj))
        return frames_in, fj

    # ---- async-path face gating (zero host syncs; see _face_gate_dev)
    def _face_mirror(self):
        """Lazy device mirror of _last_face_at: seconds rebased to the
        engine epoch; 0 means 'never' -> -1e9 so the gate opens at once."""
        if self._face_last_dev is None:
            host = self._last_face_at
            base = np.where(
                host > 0, host - self._face_epoch, -1e9
            ).astype(np.float32)
            self._face_last_dev = jnp.asarray(base)
        return self._face_last_dev

    def _face_gate_async(self, i0: int, gs: int, now: float):
        """Device-computed min-interval gate for rows [i0, i0+gs)."""
        return _face_gate_dev(
            self._face_mirror(), gs, i0,
            self._now_device(now), self._min_interval_device(),
        )

    def _now_device(self, now: float):
        """Cached device scalar of (now - epoch), 25 ms buckets."""
        q = int((now - self._face_epoch) * 40.0)
        if self._now_bucket != q:
            self._now_bucket = q
            self._now_dev = jnp.asarray(np.float32(q / 40.0))
        return self._now_dev

    def _min_interval_device(self):
        mi = float(self.face_min_interval_s)
        if self._mi_cache is None or self._mi_cache[0] != mi:
            self._mi_cache = (mi, jnp.asarray(np.float32(mi)))
        return self._mi_cache[1]

    def _face_applied_async(self, i0: int, applied, now: float) -> None:
        """Fold the step's face_applied output into the device mirror --
        no readback; the host array is refreshed only by sync paths."""
        self._face_last_dev = _face_update_dev(
            self._face_last_dev, i0, applied, self._now_device(now)
        )

    # ---- the serving step ---------------------------------------------
    def process(self, frames: np.ndarray) -> dict:
        """One batch step: frames uint8 [S, H, W, 3] (row s ignored for
        inactive slots).  Returns dict with composited 'frame' [S,H,W,3]
        u8, 'alpha', and 'metrics'."""
        t0 = time.perf_counter()
        self._apply_staged()

        now = time.monotonic()
        gate = jnp.asarray(
            (now - self._last_face_at) >= self.face_min_interval_s
        )

        frames_in, frames_j = self._ingest(frames)
        degraded = self.health.state is EngineHealth.DEGRADED and not self.health.should_probe
        extras = {}
        if degraded:
            out_frames = frames_in
            alpha = jnp.ones((self.num_streams, *self.statics.mask_hw), jnp.float32)
            applied = np.zeros((self.num_streams,), bool)
            t1 = t0
        else:
            try:
                t1 = time.perf_counter()
                new_state, out = self._step(
                    self.bundle.params, self.state, frames_j,
                    self.backgrounds, self.knobs, gate,
                )
                jax.block_until_ready(out["frame"])
                self.state = new_state
                out_frames = out["frame"]
                # packed-composite output -> natural layout for the host
                # API (the native encode stage unpacks for free instead
                # when serving through runtime/native.py)
                if self._unpack_frames is not None and out_frames.shape[-1] != 3:
                    out_frames = self._unpack_frames(out_frames)
                alpha = out["alpha"]
                applied = np.asarray(out["face_applied"])
                extras = {
                    k: v for k, v in out.items()
                    if k not in ("frame", "alpha", "face_applied")
                }
                self.health.record_success()
            except Exception as e:  # graceful per-batch degradation
                self.health.record_failure(e)
                # passthrough: input frames unmodified (drop-to-passthrough
                # on model error, SURVEY.md §5)
                out_frames = frames_in
                alpha = jnp.ones((self.num_streams, *self.statics.mask_hw), jnp.float32)
                applied = np.zeros((self.num_streams,), bool)
                t1 = t0

        self._last_face_at[applied] = now
        t2 = time.perf_counter()
        n_active = int(self.active.sum()) or self.num_streams
        self.counters.record_step(
            n_active, (t2 - t1) * 1e3, (t2 - t0) * 1e3
        )
        return {
            "frame": out_frames,
            "alpha": alpha,
            "metrics": self.stats(),
            **extras,
        }

    # ---- double-buffered serving (SURVEY.md §7 step 6) ----------------
    def dispatch(self, frames: np.ndarray) -> dict:
        """Launch one batch step WITHOUT waiting for the device.

        JAX async dispatch returns futures immediately; `self.state`
        advances to the (not yet materialized) new state so the next
        dispatch chains on-device.  Pair with :meth:`collect` -- keeping
        one step in flight overlaps host assembly of batch N+1 with
        device compute of batch N (the double-buffered HBM staging the
        BASELINE names; the host half is native/framebuf.cpp's double
        buffer).  Returns an opaque token for collect().
        """
        t0 = time.perf_counter()
        self._apply_staged()
        now = time.monotonic()
        gate = self._face_gate_async(0, self.num_streams, now)
        frames_in, frames_j = self._ingest(frames)
        token = {"t0": t0, "now": now, "frames_in": frames_in}
        degraded = (
            self.health.state is EngineHealth.DEGRADED
            and not self.health.should_probe
        )
        if degraded:
            token["degraded"] = True
            return token
        self._maybe_snapshot()
        try:
            t1 = time.perf_counter()
            prev_state = None if self._donate else self.state
            new_state, out = self._step(
                self.bundle.params, self.state, frames_j,
                self.backgrounds, self.knobs, gate,
            )
            self.state = new_state
            # fold face timing on device -- collect() must not read back
            self._face_applied_async(0, out["face_applied"], now)
            token.update(out=out, t1=t1, prev_state=prev_state)
        except Exception as e:  # trace/dispatch-time failure
            self.health.record_failure(e)
            token["failed"] = True
        return token

    def collect(self, token: dict) -> dict:
        """Wait for a dispatched step and return its results (same dict
        shape as :meth:`process`).  An asynchronous device failure rolls
        the engine back (undonated) or restores from the last host
        snapshot (donated; :meth:`_recover_state` -- surviving streams
        keep their cadence/affine identity and only the EMA re-warms)
        and returns the batch's input frames as passthrough.  Tokens
        from :meth:`dispatch_range` are delegated to
        :meth:`collect_range`."""
        if "slots" in token:
            return self.collect_range(token)
        t0 = token["t0"]
        frames_in = token["frames_in"]
        if "out" in token:
            try:
                out = token["out"]
                if self._collect_sync:
                    jax.block_until_ready(out["frame"])
                out_frames = out["frame"]
                if self._unpack_frames is not None and out_frames.shape[-1] != 3:
                    out_frames = self._unpack_frames(out_frames)
                alpha = out["alpha"]
                self.health.record_success()
                t1 = token["t1"]
            except Exception as e:  # async execution failure
                self.health.record_failure(e)
                if token.get("prev_state") is not None:
                    self.state = token["prev_state"]
                else:
                    # donated buffers are gone: restore from snapshot
                    self._recover_state()
                # the dispatch-time mirror update chained on the poisoned
                # step: rebuild lazily from the host array
                self._face_last_dev = None
                out_frames = frames_in
                alpha = jnp.ones(
                    (self.num_streams, *self.statics.mask_hw), jnp.float32
                )
                t1 = t0
        else:
            out_frames = frames_in
            alpha = jnp.ones(
                (self.num_streams, *self.statics.mask_hw), jnp.float32
            )
            t1 = t0
        t2 = time.perf_counter()
        n_active = int(self.active.sum()) or self.num_streams
        self.counters.record_step(n_active, (t2 - t1) * 1e3, (t2 - t0) * 1e3)
        return {"frame": out_frames, "alpha": alpha, "metrics": self.stats()}

    # ---- ranged double-buffered serving (the production rotation) -----
    _CHEAP_FIELDS = ("affine", "has_affine", "frame_idx",
                     "face_center", "has_center")

    def _maybe_snapshot(self) -> None:
        """On the configured cadence, take a DEVICE-side copy of the
        recovery snapshot (called at dispatch time, before the step is
        launched, so the copy captures a known-good state) and start an
        async host prefetch of it.  Nothing here blocks: materialization
        to host numpy happens only inside :meth:`_recover_state`, where
        paying a readback is fine.  The copy survives donation (jnp.copy
        = fresh buffers) and survives compute poisoning (NaN/bad-input
        failures leave buffers intact); on outright device loss the
        prefetch, if complete, still yields the host bytes -- else
        recovery degrades to the documented cold start."""
        n = self._dispatches
        self._dispatches += 1
        every = self.snapshot_every
        if not every or n % every:
            return
        if self._snap_pending is not None:
            # previous cadence point becomes the fallback snapshot
            self._snap = self._snap_pending
        if self.state_snapshot_every and n % self.state_snapshot_every == 0:
            kind, tree = "full", self._snap_copy(self.state)
        else:
            # cheap fields packed into ONE [S, K] f32 buffer (a jitted
            # cast+concat): a single device copy and a single host
            # prefetch call instead of one per field -- per-call transfer
            # overhead is what bounds the serving loop, not bytes
            kind = "cheap_packed"
            tree = self._cheap_pack()
        # device-side copy first: the state buffers themselves get
        # DONATED to the very step this snapshot guards, which would
        # invalidate a host copy still in flight.  The copy is jitted
        # (one dispatch; eager per-leaf copies are pathological over
        # slow transports) and owned by the snapshot.
        for x in jax.tree_util.tree_leaves(tree):
            if hasattr(x, "copy_to_host_async"):
                x.copy_to_host_async()
        self._snap_pending = {"kind": kind, "tree": tree}

    def _cheap_fields(self):
        return [
            (k, getattr(self.state, k))
            for k in self._CHEAP_FIELDS
            if getattr(self.state, k) is not None
        ]

    def _cheap_pack(self):
        """[S, K] f32 pack of the cheap per-stream fields (fresh buffer:
        jnp concat of casts never aliases the donated state)."""
        if self._cheap_pack_fn is None:
            fields = self._cheap_fields()
            self._cheap_spec = [
                (k, v.shape[1:], v.dtype) for k, v in fields
            ]

            def pack(state):
                cols = [
                    getattr(state, k)
                    .reshape(self.num_streams, -1)
                    .astype(jnp.float32)
                    for k, _, _ in self._cheap_spec
                ]
                return jnp.concatenate(cols, axis=1)

            self._cheap_pack_fn = jax.jit(pack)
        return self._cheap_pack_fn(self.state)

    def _cheap_unpack(self, packed_np):
        """Host-side inverse of :meth:`_cheap_pack`."""
        out, o = {}, 0
        for k, shp, dt in self._cheap_spec:
            n = int(np.prod(shp)) if shp else 1
            col = packed_np[:, o : o + n].reshape(
                (self.num_streams, *shp)
            )
            out[k] = col.astype(dt)
            o += n
        return out

    def _recover_state(self) -> None:
        """Rebuild ``self.state`` after a donated-step failure: restore
        the last completed host snapshot (full state if the deployment
        snapshots it, else the cheap per-stream fields over a cold EMA)
        so one poisoned step does NOT cold-restart every stream's
        temporal identity (SURVEY.md §5 per-stream degradation).

        Snapshots are held as DEVICE copies with an async host prefetch
        (:meth:`_maybe_snapshot`); this is the one place that pays the
        host materialization, newest first -- a snapshot that cannot be
        read (device loss before its prefetch finished) falls back to
        the previous one, then to the cold start."""
        snap = None
        for cand in (self._snap_pending, self._snap):
            if cand is None:
                continue
            try:
                snap = {
                    "kind": cand["kind"],
                    "tree": jax.tree_util.tree_map(
                        np.asarray, cand["tree"]
                    ),
                }
                break
            except Exception:
                continue  # unreadable copy: try the older snapshot
        self._snap_pending = None
        if snap is not None and snap["kind"] == "full":
            restored = jax.tree_util.tree_map(jnp.asarray, snap["tree"])
            if self.mesh is not None:
                from video_stream_segmenetation_tpu import parallel

                restored = parallel.shard_stream_tree(self.mesh, restored)
            self.state = restored
            return
        fresh = runtime.init_state(
            self.num_streams, self.statics.mask_hw,
            rec=jax.tree_util.tree_map(jnp.zeros_like, self.state.rec),
        )
        if snap is not None:
            import dataclasses

            tree = snap["tree"]
            if snap["kind"] == "cheap_packed":
                tree = self._cheap_unpack(tree)
            fresh = dataclasses.replace(
                fresh,
                **{k: jnp.asarray(v) for k, v in tree.items()},
            )
        if self.mesh is not None:
            from video_stream_segmenetation_tpu import parallel

            fresh = parallel.shard_stream_tree(self.mesh, fresh)
        self.state = fresh

    def dispatch_range(self, i0: int, i1: int, frames) -> dict:
        """Launch one group step for stream rows ``[i0, i1)`` WITHOUT
        waiting -- the pipelined analog of :meth:`process_range` and the
        step the production rotation runs (StreamScheduler
        ``group_sizes`` + ``run_forever``).  The group slice/scatter
        happens INSIDE the jitted program over the full donated state
        (runtime.make_range_step), so rotating groups costs no eager
        per-tick state copies.  Pair with :meth:`collect_range`."""
        t0 = time.perf_counter()
        self._apply_staged()
        now = time.monotonic()
        frames_in, frames_j = self._ingest(frames, rows=i1 - i0)
        token = {"t0": t0, "now": now, "frames_in": frames_in,
                 "slots": (i0, i1)}
        if (
            self.health.state is EngineHealth.DEGRADED
            and not self.health.should_probe
        ):
            token["degraded"] = True
            return token
        self._maybe_snapshot()
        try:
            t1 = time.perf_counter()
            prev_state = None if self._donate else self.state
            # ONE dispatch per tick: the face min-interval gate + applied
            # scatter ride the jitted program (runtime.make_range_step)
            new_full, new_last, out = self._range_step(
                self.bundle.params, self.state, i0, frames_j,
                self.backgrounds, self.knobs, self._face_mirror(),
                self._now_device(now), self._min_interval_device(),
                gs=i1 - i0,
            )
            self.state = new_full
            self._face_last_dev = new_last
            token.update(out=out, t1=t1, prev_state=prev_state)
        except Exception as e:  # trace/dispatch-time failure
            self.health.record_failure(e)
            token["failed"] = True
        return token

    def collect_range(self, token: dict) -> dict:
        """Wait for a ranged dispatch and return its group's results
        (same dict shape as :meth:`process_range`).  On an async device
        failure the full state is poisoned (the group scatter aliases
        it), so recovery rolls back (undonated) or restores the last
        snapshot (donated, :meth:`_recover_state`)."""
        i0, i1 = token["slots"]
        gs = i1 - i0
        t0 = token["t0"]
        frames_in = token["frames_in"]
        if "out" in token:
            try:
                out = token["out"]
                if self._collect_sync:
                    jax.block_until_ready(out["frame"])
                out_frames = out["frame"]
                if self._unpack_frames is not None and out_frames.shape[-1] != 3:
                    out_frames = self._unpack_frames(out_frames)
                alpha = out["alpha"]
                self.health.record_success()
                t1 = token["t1"]
            except Exception as e:  # async execution failure
                self.health.record_failure(e)
                if token.get("prev_state") is not None:
                    self.state = token["prev_state"]
                else:
                    self._recover_state()
                # the dispatch-time mirror update chained on the poisoned
                # step: rebuild lazily from the host array
                self._face_last_dev = None
                out_frames = frames_in
                alpha = jnp.ones((gs, *self.statics.mask_hw), jnp.float32)
                t1 = t0
        else:
            out_frames = frames_in
            alpha = jnp.ones((gs, *self.statics.mask_hw), jnp.float32)
            t1 = t0
        t2 = time.perf_counter()
        self.counters.record_step(gs, (t2 - t1) * 1e3, (t2 - t0) * 1e3)
        return {
            "frame": out_frames,
            "alpha": alpha,
            "slots": (i0, i1),
            "metrics": self.stats(),
        }

    def dispatch_round(self, group_sizes, frames_list) -> dict:
        """Launch one FULL rotation round (every group stepped once) as
        ONE jitted dispatch (runtime.make_round_step) -- the fused form
        of ``dispatch_range`` called per group.  Two wins, measured
        (benchmarks/RESULTS.md round 4): the device overlaps the groups'
        independent stages (a 4x96 round runs ~25 ms vs ~32 dispatched
        per group), and the host pays one dispatch per frame interval
        instead of one per group.  Knob staging and the face
        min-interval clock advance per ROUND (= per frame interval).
        Pair with :meth:`collect_round`."""
        t0 = time.perf_counter()
        self._apply_staged()
        now = time.monotonic()
        ins = [
            self._ingest(f, rows=g)
            for f, g in zip(frames_list, group_sizes)
        ]
        token = {
            "t0": t0, "now": now, "round": True,
            "frames_in": [i[0] for i in ins],
            "group_sizes": [int(g) for g in group_sizes],
        }
        if (
            self.health.state is EngineHealth.DEGRADED
            and not self.health.should_probe
        ):
            token["degraded"] = True
            return token
        self._maybe_snapshot()
        try:
            t1 = time.perf_counter()
            prev_state = None if self._donate else self.state
            new_full, new_last, outs = self._round_step_for(group_sizes)(
                self.bundle.params, self.state, [i[1] for i in ins],
                self.backgrounds, self.knobs, self._face_mirror(),
                self._now_device(now), self._min_interval_device(),
            )
            self.state = new_full
            self._face_last_dev = new_last
            token.update(outs=outs, t1=t1, prev_state=prev_state)
        except Exception as e:  # trace/dispatch-time failure
            self.health.record_failure(e)
            token["failed"] = True
        return token

    def collect_round(self, token: dict) -> "list[dict]":
        """Wait for a dispatched round; returns one result dict per group
        (the shape :meth:`collect_range` returns).  On an async device
        failure the whole round's state is poisoned: roll back
        (undonated) or restore the snapshot (donated), and return every
        group's input frames as passthrough."""
        gs = token["group_sizes"]
        offs = np.concatenate([[0], np.cumsum(gs)]).astype(int)
        t0 = token["t0"]
        results: list[dict] = []
        if "outs" in token:
            try:
                outs = token["outs"]
                if self._collect_sync:
                    jax.block_until_ready(outs[-1]["frame"])
                for g, out in enumerate(outs):
                    of = out["frame"]
                    if self._unpack_frames is not None and of.shape[-1] != 3:
                        of = self._unpack_frames(of)
                    results.append({
                        "frame": of, "alpha": out["alpha"],
                        "slots": (int(offs[g]), int(offs[g + 1])),
                    })
                self.health.record_success()
                t1 = token["t1"]
            except Exception as e:  # async execution failure
                self.health.record_failure(e)
                if token.get("prev_state") is not None:
                    self.state = token["prev_state"]
                else:
                    self._recover_state()
                self._face_last_dev = None
                results, t1 = [], t0
        else:
            t1 = t0
        if not results:  # degraded / failed: passthrough per group
            results = [
                {
                    "frame": token["frames_in"][g],
                    "alpha": jnp.ones(
                        (gs[g], *self.statics.mask_hw), jnp.float32
                    ),
                    "slots": (int(offs[g]), int(offs[g + 1])),
                }
                for g in range(len(gs))
            ]
        t2 = time.perf_counter()
        self.counters.record_step(
            int(sum(gs)), (t2 - t1) * 1e3, (t2 - t0) * 1e3
        )
        stats = self.stats()
        for r in results:
            r["metrics"] = stats
        return results

    def process_group(self, group: int, num_groups: int, frames: np.ndarray) -> dict:
        """Latency-mode step: process only stream group ``group`` (rows
        ``[g*S/G, (g+1)*S/G)``), leaving other groups' state untouched.

        The latency serving mode (benchmarks/RESULTS.md): 64 streams as
        4 staggered 16-stream groups, one group per tick at 4x the frame
        rate -- a 16-stream step is 5.4 ms on v5e (< the 8 ms p50
        target), and 4 ticks fit in a 33 ms frame interval at 65% duty.
        ``frames``: the group's frames only ([S/G, H, W, 3] or packed).
        """
        if self.num_streams % num_groups:
            raise ValueError("num_groups must divide num_streams")
        gs = self.num_streams // num_groups
        return self.process_range(group * gs, (group + 1) * gs, frames)

    def process_range(self, i0: int, i1: int, frames: np.ndarray) -> dict:
        """Step an arbitrary stream-row range ``[i0, i1)``, leaving other
        rows' state untouched -- the general form of :meth:`process_group`
        used by heterogeneous group schedules (StreamScheduler
        ``group_sizes``, e.g. 4x96+16 = 400 streams packing a v5e's 33 ms
        frame budget; benchmarks/RESULTS.md).  The jitted step is shape-
        polymorphic over the row count, so each distinct group size
        compiles once.
        """
        gs = i1 - i0
        t0 = time.perf_counter()
        self._apply_staged()
        now = time.monotonic()
        gate = jnp.asarray(
            (now - self._last_face_at[i0:i1]) >= self.face_min_interval_s
        )
        frames_in, frames_j = self._ingest(frames, rows=i1 - i0)

        rows = lambda tree: jax.tree_util.tree_map(lambda x: x[i0:i1], tree)
        degraded = (
            self.health.state is EngineHealth.DEGRADED
            and not self.health.should_probe
        )
        t1 = time.perf_counter()
        if degraded:
            out_frames = frames_in
            alpha = jnp.ones((gs, *self.statics.mask_hw), jnp.float32)
        else:
            try:
                new_gstate, out = self._step(
                    self.bundle.params, rows(self.state), frames_j,
                    self.backgrounds[i0:i1], rows(self.knobs), gate,
                )
                jax.block_until_ready(out["frame"])
                self.state = jax.tree_util.tree_map(
                    lambda full, g: full.at[i0:i1].set(g), self.state, new_gstate
                )
                applied = np.zeros((self.num_streams,), bool)
                applied[i0:i1] = np.asarray(out["face_applied"])
                self._last_face_at[applied] = now
                self.health.record_success()
                out_frames = out["frame"]
                if self._unpack_frames is not None and out_frames.shape[-1] != 3:
                    out_frames = self._unpack_frames(out_frames)
                alpha = out["alpha"]
            except Exception as e:
                # same drop-to-passthrough recovery as process(): a Mosaic
                # fault in latency mode must degrade, not kill the loop
                self.health.record_failure(e)
                out_frames = frames_in
                alpha = jnp.ones((gs, *self.statics.mask_hw), jnp.float32)
                t1 = t0
        t2 = time.perf_counter()
        self.counters.record_step(gs, (t2 - t1) * 1e3, (t2 - t0) * 1e3)
        return {
            "frame": out_frames,
            "alpha": alpha,
            "slots": (i0, i1),
            "metrics": self.stats(),
        }

    def process_chunked(self, frames: np.ndarray, chunk_size: int) -> dict:
        """Latency-oriented step: dispatch the batch as consecutive
        sub-batches of ``chunk_size`` streams.

        Streams are independent, so results are identical to `process`;
        the first chunk's frames are ready after roughly a chunk-sized
        step (e.g. at S=64 on v5e: full step 31.6 ms vs ~10.5 ms for a
        16-stream chunk -- benchmarks/RESULTS.md latency sweep), at some
        total-throughput cost.  JAX async dispatch pipelines the chunks.
        """
        if self.num_streams % chunk_size:
            raise ValueError("chunk_size must divide num_streams")
        t0 = time.perf_counter()
        self._apply_staged()
        now = time.monotonic()
        gate_np = (now - self._last_face_at) >= self.face_min_interval_s
        frames_in, frames_j = self._ingest(frames)

        def rows(tree, i0, i1):
            return jax.tree_util.tree_map(lambda x: x[i0:i1], tree)

        def frame_rows(fj, i0, i1):
            # (packed, lanes) step input: lanes carry streams on axis 1
            if isinstance(fj, tuple):
                return (fj[0][i0:i1], fj[1][:, i0:i1])
            return fj[i0:i1]

        degraded = (
            self.health.state is EngineHealth.DEGRADED
            and not self.health.should_probe
        )
        t1 = time.perf_counter()
        if degraded:
            out_frames = frames_in
            alpha = jnp.ones((self.num_streams, *self.statics.mask_hw), jnp.float32)
        else:
            try:
                new_states, outs = [], []
                for i0 in range(0, self.num_streams, chunk_size):
                    i1 = i0 + chunk_size
                    st, out = self._step(
                        self.bundle.params,
                        rows(self.state, i0, i1),
                        frame_rows(frames_j, i0, i1),
                        self.backgrounds[i0:i1],
                        rows(self.knobs, i0, i1),
                        jnp.asarray(gate_np[i0:i1]),
                    )
                    new_states.append(st)
                    outs.append(out)
                jax.block_until_ready(outs[-1]["frame"])
                concat = lambda trees: jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *trees
                )
                self.state = concat(new_states)
                out = concat(outs)
                applied = np.asarray(out["face_applied"])
                self._last_face_at[applied] = now
                self.health.record_success()
                out_frames = out["frame"]
                if self._unpack_frames is not None and out_frames.shape[-1] != 3:
                    out_frames = self._unpack_frames(out_frames)
                alpha = out["alpha"]
            except Exception as e:  # drop-to-passthrough, as in process()
                self.health.record_failure(e)
                out_frames = frames_in
                alpha = jnp.ones(
                    (self.num_streams, *self.statics.mask_hw), jnp.float32
                )
                t1 = t0
        t2 = time.perf_counter()
        n_active = int(self.active.sum()) or self.num_streams
        self.counters.record_step(n_active, (t2 - t1) * 1e3, (t2 - t0) * 1e3)
        return {"frame": out_frames, "alpha": alpha, "metrics": self.stats()}

    # ---- observability -------------------------------------------------
    def stats(self) -> dict:
        """The counter surface: FPS / latency / total / thread-load
        (performance.ts contract) + health."""
        return {**self.counters.snapshot(), "health": self.health.snapshot()}

    def stream_stats(self) -> list[dict]:
        """Per-stream counters (SURVEY.md §5: the overlay surface *per
        stream*): frames served, activity, face-tracking freshness."""
        idx = np.asarray(self.state.frame_idx)
        has_aff = np.asarray(self.state.has_affine)
        now = time.monotonic()
        return [
            {
                "slot": s,
                "active": bool(self.active[s]),
                "frames": int(idx[s]),
                "face_affine": bool(has_aff[s]),
                "last_face_s_ago": (
                    round(now - self._last_face_at[s], 2)
                    if self._last_face_at[s] > 0
                    else None
                ),
            }
            for s in range(self.num_streams)
        ]
