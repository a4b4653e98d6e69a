"""Two-stage training driver (coarse static 3DGS, then fine + deformation).

Orchestrates the jitted train step, adaptive densification schedule,
opacity resets, SH-degree ramp and evaluation — the functional equivalent of
ref train.py:41-296 (scene_reconstruction).

TPU-native design notes (vs the reference):
  * The per-camera Python render loop (ref train.py:180-192) becomes one
    vmap over the camera batch inside a single jitted step.
  * Gaussian buffers are fixed-capacity with an alive mask, but the LIVE
    capacity is bucketed to the next power of two and buffers are
    compacted+resized on the host at densify boundaries, so early training
    (a few k points) never pays full-capacity compute. Each bucket size
    triggers one recompile; buckets are few (log2 spread).
  * LR schedules, loss, regularizers, optimizer update and densify stats
    all live on-device inside the step; the host only drives the schedule.
"""
from __future__ import annotations

import dataclasses
import functools
import threading
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.models.deformation import DeformConfig
from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.models.regularization import compute_regulation
from fourdgs_tpu.ops import losses
from fourdgs_tpu.ops.rasterize_tiled import RasterConfig
from fourdgs_tpu.render.render import render
from fourdgs_tpu.train import densify as densify_mod
from fourdgs_tpu.train import optim
from fourdgs_tpu.train.config import Config
from fourdgs_tpu.train.state import TrainState, deform_config_from


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    image: jnp.ndarray          # first image of batch (for debug/eval)
    # binner overflow telemetry, summed over the batch (0 = clean step)
    dropped_pairs: Any = 0
    dropped_tile: Any = 0
    # gaussians visible in ANY batch view. A collapse to 0 while alive > 0
    # is the signature of silent divergence (deformation flinging points
    # out of the frustum / collapsing scales): the render becomes pure
    # background, the loss stays FINITE, and every gradient is exactly
    # zero — training freezes forever without tripping a NaN probe.
    # (Observed: synth_mv fine-2800, grid product blow-up.)
    n_visible: Any = -1
    # total (gaussian, tile) pairs before capping, summed over the batch —
    # the denominator for drop-materiality decisions (the dropped_tile
    # counter is an upper bound; see autogrow)
    num_pairs: Any = 0
    # max TRUE per-tile pair count over the batch (pre-cap) — drives
    # tile_cap auto-shrink
    tile_peak: Any = 0
    # max accumulated alpha over every pixel of the batch — the CONTRIBUTION
    # signal the visibility count misses. Projection radii stay positive
    # when collapsed scales / runaway deltas push every per-pixel alpha
    # below the 1/255 compositing gate (ref CUDA forward.cu culls at
    # 1/255), yet the blend then composites NOTHING: the render is pure
    # background and every photometric gradient is exactly zero while the
    # regularizer keeps drifting the grids. (Observed: synth_mv_r3 froze
    # for 9k iters with n_visible == 23k but max_alpha == 0.)
    max_alpha: Any = 1.0


def raster_config_from(cfg: Config, width: int, height: int) -> RasterConfig:
    r = cfg.raster
    return RasterConfig(img_width=width, img_height=height,
                        tile_size=r.tile_size, tile_cap=r.tile_cap,
                        pair_cap=r.pair_cap, chunk=r.chunk,
                        backend=r.backend, bin_chunk=r.bin_chunk,
                        bin_pairs_per_chunk=r.bin_pairs_per_chunk,
                        fuse_pack=r.fuse_pack)


@functools.partial(
    jax.jit,
    static_argnames=("stage", "raster_cfg", "deform_cfg", "tx",
                     "lambda_dssim", "reg_weights", "track_stats"))
def train_step(state: TrainState, cameras: Camera, gts: jnp.ndarray,
               bg: jnp.ndarray, active_sh, *, stage: str,
               raster_cfg: RasterConfig, deform_cfg: DeformConfig,
               tx, lambda_dssim: float, reg_weights: tuple,
               track_stats: bool = True):
    """One optimization step over a batch of cameras. Returns (state, aux)."""
    cap = state.capacity

    def loss_fn(params, ndc_offset):
        def render_one(cam):
            return render(params["gauss"], params["deform"], cam, bg,
                          raster_cfg, deform_cfg, state.aabb, state.alive,
                          active_sh, stage=stage, ndc_offset=ndc_offset)

        # Batch size is static under jit. vmap over a camera axis
        # measurably pessimizes the binner's scatters (+6.5 ms fwd at
        # 100k/800px on v5e: batched scatter lowers worse than flat), so
        # small batches unroll into sequential renders instead (the
        # reference's own structure, ref train.py:180-192): batch-2
        # unrolled 17.4M vs vmapped 14.5M rays/s at the bench point.
        # From batch 4 up, vmap's amortization wins (20.0M vs 18.1M) —
        # see PLAN.md r5-final ledger. batch=1 (the reference's D-NeRF
        # regime) bypasses both.
        batch = jax.tree.leaves(cameras)[0].shape[0]
        if batch == 1:
            outs = jax.tree.map(
                lambda x: x[None],
                render_one(jax.tree.map(lambda x: x[0], cameras)))
        elif batch <= 3:
            outs_list = [
                render_one(jax.tree.map(lambda x: x[i], cameras))
                for i in range(batch)]
            outs = jax.tree.map(lambda *xs: jnp.stack(xs), *outs_list)
        else:
            outs = jax.vmap(render_one)(cameras)
        imgs = outs.color
        l1 = losses.l1_loss(imgs, gts)
        loss = l1
        if stage == "fine" and reg_weights[0] != 0:
            time_w, l1_w, tv_w = reg_weights
            loss = loss + compute_regulation(
                params["deform"]["grid"], time_w, l1_w, tv_w)
        if lambda_dssim != 0:
            loss = loss + lambda_dssim * (1.0 - losses.ssim(imgs, gts))
        psnr = losses.psnr(imgs, gts).mean()
        return loss, (l1, psnr, outs)

    ndc_offset = jnp.zeros((cap, 2))
    (loss, (l1, psnr, outs)), (grads, ndc_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, ndc_offset)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    new_state = state._replace(params=params, opt_state=opt_state,
                               step=state.step + 1)
    if track_stats:
        # densification stats (ref train.py:259-262): radii max over batch,
        # visibility any over batch, accumulate screen-space grad norms.
        radii = outs.radii.max(axis=0)
        visible = outs.visibility.any(axis=0)
        gnorm = jnp.linalg.norm(ndc_grad, axis=-1)
        new_state = new_state._replace(
            max_radii2d=jnp.where(visible,
                                  jnp.maximum(state.max_radii2d, radii),
                                  state.max_radii2d),
            xyz_gradient_accum=state.xyz_gradient_accum
            + jnp.where(visible, gnorm, 0.0),
            denom=state.denom + visible.astype(jnp.float32),
        )
    aux = StepAux(loss=loss, l1=l1, psnr=psnr, image=outs.color[0],
                  dropped_pairs=outs.dropped_pairs.sum(),
                  dropped_tile=outs.dropped_tile.sum(),
                  num_pairs=outs.num_pairs.sum(),
                  tile_peak=outs.tile_peak.max(),
                  n_visible=outs.visibility.any(axis=0).sum(),
                  max_alpha=outs.alpha.max())
    return new_state, aux


@functools.partial(jax.jit, static_argnames=("stage", "active_sh",
                                             "raster_cfg", "deform_cfg"))
def eval_step(state: TrainState, camera: Camera, bg: jnp.ndarray, *,
              stage: str, active_sh: int, raster_cfg: RasterConfig,
              deform_cfg: DeformConfig):
    return render(state.params["gauss"], state.params["deform"], camera, bg,
                  raster_cfg, deform_cfg, state.aabb, state.alive, active_sh,
                  stage=stage)


@jax.jit
def _grid_absmax(grids) -> jnp.ndarray:
    """max |hexplane grid value| — the runaway telltale: the level feature
    is a PRODUCT of six plane samples, so grid magnitude drift amplifies
    into huge deformation deltas (TV regularization bounds smoothness, not
    magnitude)."""
    return jnp.stack([jnp.abs(g).max() for g in
                      jax.tree.leaves(grids)]).max()


@jax.jit
def _param_nan_count(state: TrainState) -> jnp.ndarray:
    """Total NaN count across all parameter leaves.

    A fully NaN-poisoned model culls every gaussian and renders pure
    background, so the photometric loss stays FINITE — a loss-only NaN
    guard never fires (observed on a diverging run). This probe is a cheap
    fused reduction over all parameter leaves. NaN (not inf) is the poison
    signature: masked-out infs become NaN via 0 * inf in the backward and
    then spread through Adam."""
    return sum(jnp.sum(jnp.isnan(leaf)) for leaf in
               jax.tree.leaves(state.params))


# ---------------------------------------------------------------------------
# Bucketed capacity management (host side)
# ---------------------------------------------------------------------------

def _takes_raster_cfg(cb) -> bool:
    """Whether an on_test callback accepts the live raster_cfg kwarg."""
    import inspect
    try:
        return "raster_cfg" in inspect.signature(cb).parameters
    except (TypeError, ValueError):
        return False


def pick_bucket(n_alive: int, max_cap: int, min_bucket: int = 4096,
                headroom: float = 2.0) -> int:
    """Smallest capacity bucket >= n_alive * headroom, clamped to max_cap.

    Buckets are powers of two up to 64k and 64k MULTIPLES above: pow2
    rounding wastes up to 2x on every capacity-proportional stage
    (hexplane backward rows, binner slot budget, Adam) — 524288+ slots
    for 360k alive points — while 64k-multiple rounding caps the slack at
    ~18% (4.32M vs 2.89M rays/s at 360k/800px drop-free, BENCH_CAP A/B).
    The bucket is re-checked before every densify call, so capacity only
    ever needs one surgery interval's growth headroom."""
    want = max(min_bucket, int(n_alive * headroom))
    if want <= 65536:
        b = 1 << (want - 1).bit_length()
    else:
        b = -(-want // 65536) * 65536
    return min(b, max_cap)


def _abstract_resize(tree, old_cap: int, new_cap: int):
    """ShapeDtypeStruct pytree with every per-point leading axis (== old_cap)
    re-sized to new_cap; used to AOT-lower a bucket's step before any real
    buffer of that size exists."""
    def fix(x):
        shape = jnp.shape(x)
        if len(shape) >= 1 and shape[0] == old_cap:
            shape = (new_cap,) + shape[1:]
        return jax.ShapeDtypeStruct(shape, jnp.result_type(x))
    return jax.tree.map(fix, tree)


class BucketPrewarmer:
    """Background AOT compilation of upcoming train-step variants.

    The bucketed-capacity ladder recompiles the whole jitted step at every
    bucket growth; first-run compiles cost 60-90 s each through the
    remote-compile tunnel (measured: ~5 min of a 6 min synth_mv log was
    compile stalls). This pre-lowers the next bucket's step on a daemon
    thread so the XLA binary is already in the persistent compilation cache
    when the switch happens — the foreground call then pays tracing only.
    (The jit in-memory cache is NOT shared with AOT lowering; the disk
    cache is the hand-off, see utils/jax_setup.enable_compilation_cache.)
    """

    def __init__(self):
        self._warmed: set = set()
        self._lock = threading.Lock()

    def mark(self, key: tuple):
        """Record a variant as already compiled (e.g. by a live call)."""
        with self._lock:
            self._warmed.add(key)

    def queue(self, key: tuple, work: Callable[[], Any]):
        with self._lock:
            if key in self._warmed:
                return
            self._warmed.add(key)

        def run():
            try:
                t0 = time.perf_counter()
                work()
                print(f"[prewarm] {key} compiled in "
                      f"{time.perf_counter() - t0:.1f}s")
            except Exception as e:  # best effort — never kill training
                print(f"[prewarm] {key} failed: {e}")

        threading.Thread(target=run, daemon=True).start()


def compact_and_resize(state: TrainState, new_cap: int) -> TrainState:
    """Host-side: move alive slots to the front (stable) and pad/trim every
    per-point buffer (params, Adam moments, accum stats) to new_cap."""
    alive = np.asarray(state.alive)
    n_alive = int(alive.sum())
    assert n_alive <= new_cap, (n_alive, new_cap)
    order = np.argsort(~alive, kind="stable")

    def fix(x):
        x = np.asarray(x)[order]
        if new_cap <= x.shape[0]:
            return jnp.asarray(x[:new_cap])
        pad = [(0, new_cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, pad))

    def fix_gauss(g: GaussianParams, fix_rotation: bool) -> GaussianParams:
        out = GaussianParams(*[fix(getattr(g, f)) for f in GaussianParams._fields])
        # Keep padded PARAM rotations valid (w=1) so normalization is
        # well-defined. NEVER apply this to Adam moment trees: injecting
        # mu_w=1 into a slot whose mu underflowed to zero while nu_w is
        # tiny makes the next update mu/(sqrt(nu)+eps) ~ 1e14 — a single
        # catastrophic step (this exact bug blew rotations to 1e10 in
        # early runs).
        if fix_rotation and new_cap > n_alive:
            rot = np.asarray(out.rotation).copy()
            dead = np.abs(rot).sum(axis=1) == 0
            rot[dead, 0] = 1.0
            out = out._replace(rotation=jnp.asarray(rot))
        return out

    opt_state = state.opt_state._replace(
        mu={**state.opt_state.mu,
            "gauss": fix_gauss(state.opt_state.mu["gauss"],
                               fix_rotation=False)},
        nu={**state.opt_state.nu,
            "gauss": fix_gauss(state.opt_state.nu["gauss"],
                               fix_rotation=False)},
    )
    return state._replace(
        params={**state.params,
                "gauss": fix_gauss(state.params["gauss"],
                                   fix_rotation=True)},
        opt_state=opt_state,
        alive=fix(alive),
        xyz_gradient_accum=fix(state.xyz_gradient_accum),
        denom=fix(state.denom),
        max_radii2d=fix(state.max_radii2d),
    )


# ---------------------------------------------------------------------------
# Stage driver
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class StageResult:
    state: TrainState
    history: list
    wall_time: float
    active_sh: int = 0
    # the LIVE raster config at stage end — differs from the input when
    # binner-cap auto-growth fired; callers must render/eval with THIS
    # (and seed the next stage with it), not the original
    raster_cfg: Any = None


def run_stage(
    cfg: Config,
    state: TrainState,
    stage: str,
    iterations: int,
    stacked_cameras: Camera,          # batched Camera pytree (n_views, ...)
    images: jnp.ndarray,              # (n_views, H, W, 3) on device
    tx,
    raster_cfg: RasterConfig,
    rng: np.random.Generator,
    key: jax.Array,
    log_every: int = 100,
    log_fn: Callable[[dict], None] | None = None,
    zerostamp_view_mask: np.ndarray | None = None,
    cameras_extent: float = 1.0,
    test_iterations: tuple = (),
    save_iterations: tuple = (),
    checkpoint_iterations: tuple = (),
    on_test: Callable | None = None,
    on_save: Callable | None = None,
    on_checkpoint: Callable | None = None,
    epoch_order_fn: Callable | None = None,
    mesh=None,
    on_iteration: Callable | None = None,
    start_iteration: int = 0,
    initial_active_sh: int = 0,
) -> StageResult:
    """`start_iteration` resumes the stage mid-way: the loop runs
    range(start_iteration+1, iterations+1) so all it-based schedules
    (densify, opacity reset, SH ramp, saves) stay aligned with the
    reference's resume semantics (ref train.py:47-55,108).
    `initial_active_sh` carries the SH degree across stage boundaries and
    checkpoint restores (the reference persists active_sh_degree on the
    model)."""
    opt = cfg.opt
    deform_cfg = deform_config_from(cfg)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    n_views = images.shape[0]
    batch = opt.batch_size
    extent = float(cameras_extent)
    reg_weights = (cfg.hidden.time_smoothness_weight,
                   cfg.hidden.l1_time_planes, cfg.hidden.plane_tv_weight)

    view_pool = np.arange(n_views)
    if zerostamp_view_mask is not None:
        view_pool = view_pool[zerostamp_view_mask]

    def next_epoch():
        if epoch_order_fn is not None:
            return epoch_order_fn(rng)
        return rng.permutation(view_pool)

    perm = next_epoch()
    ptr = 0

    active_sh = min(initial_active_sh, cfg.model.sh_degree)
    history = []
    t0 = time.perf_counter()
    paused = 0.0
    nan_check_every = 25  # device->host sync cadence for the NaN guard
    # seed the guard with the incoming state so a divergence inside the
    # first check window can still roll back (instead of aborting)
    last_good, last_good_it = state, start_iteration
    rollbacks = 0
    last_cap_change = start_iteration
    # Host-cached alive count: `int(state.alive.sum())` is a blocking
    # device->host sync; doing it every iteration serializes the dispatch
    # pipeline (~4.5 it/s observed at 400px where the device step is
    # ~20 ms). The count only changes at surgery, so refresh it there.
    n_alive = int(state.alive.sum())

    min_bucket = cfg.raster.min_bucket
    headroom = cfg.raster.bucket_headroom

    def bucket_for(n):
        return pick_bucket(n, cfg.raster.capacity, min_bucket, headroom)

    prewarmer = (BucketPrewarmer()
                 if cfg.raster.prewarm and mesh is None else None)

    def queue_prewarm(bucket: int, track: bool, cams_ex, gts_ex):
        """AOT-lower the (bucket, track_stats, raster_cfg) step variant in
        background. The LIVE raster config is part of the key AND snapshot
        into the work closure: binner-cap auto-growth changes the config
        mid-stage, and a prewarmed executable for the stale config is
        useless at the bucket switch (observed: a 635 s cold compile at
        the 131072 switch after tile-cap growth invalidated the 27 s
        prewarm, synth_mv_r5 log)."""
        if prewarmer is None:
            return
        sds = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
        abs_state = _abstract_resize(state, state.capacity, bucket)
        abs_cams = jax.tree.map(sds, cams_ex)
        abs_gts, abs_bg = sds(gts_ex), sds(bg)
        abs_sh = jax.ShapeDtypeStruct((), jnp.int32)
        rcfg_snap = raster_cfg

        def work():
            train_step.lower(
                abs_state, abs_cams, abs_gts, abs_bg, abs_sh, stage=stage,
                raster_cfg=rcfg_snap, deform_cfg=deform_cfg, tx=tx,
                lambda_dssim=float(opt.lambda_dssim),
                reg_weights=reg_weights, track_stats=track).compile()

        prewarmer.queue((stage, bucket, track, rcfg_snap), work)

    for it in range(start_iteration + 1, iterations + 1):
        if on_iteration is not None:
            # e.g. the GUI socket poll (ref train.py:109-134); excluded
            # from reported train time
            tp = time.perf_counter()
            on_iteration(it, state, active_sh)
            paused += time.perf_counter() - tp
        if it % 1000 == 0 and active_sh < cfg.model.sh_degree:
            active_sh += 1

        # epoch-permutation batch sampling (reference pops without
        # replacement from a shuffled stack, ref train.py:157-167), or a
        # custom order (FineSampler) when epoch_order_fn is given
        if ptr + batch > len(perm):
            perm = next_epoch()
            ptr = 0
        idxs = perm[ptr:ptr + batch]
        ptr += batch
        # overlap the NEXT batch's decode + host->device upload with this
        # step's compute (host/lazy ImageBanks; no-op at epoch boundaries
        # where the next permutation isn't drawn yet)
        if hasattr(images, "prefetch") and ptr + batch <= len(perm):
            nxt = perm[ptr:ptr + batch]
            if mesh is not None and jax.process_count() > 1:
                from fourdgs_tpu.parallel import multihost
                nxt = nxt[multihost.host_batch_slice(len(nxt))]
            images.prefetch(nxt)

        if mesh is not None and jax.process_count() > 1:
            # multi-host: every process drew the same permutation (same
            # seed); each loads only its contiguous slice of the global
            # batch and the slices are assembled into one global array
            # sharded over the mesh's data axis (DCN story, SURVEY §5.8)
            from fourdgs_tpu.parallel import multihost
            sl = multihost.host_batch_slice(len(idxs))
            cams = jax.tree.map(lambda a: a[idxs[sl]], stacked_cameras)
            cams, gts = multihost.global_batch(
                (cams, images[idxs[sl]]), mesh)
        else:
            cams = jax.tree.map(lambda a: a[idxs], stacked_cameras)
            gts = images[idxs]

        if prewarmer is not None:
            track_now = it < opt.densify_until_iter
            # the live call below compiles (stage, capacity, track_now)
            prewarmer.mark((stage, state.capacity, track_now, raster_cfg))
            # bucket growth: once alive count passes ~half the switch
            # threshold, warm the next bucket in the background
            if (state.capacity < cfg.raster.capacity
                    and n_alive * headroom * 2 > state.capacity):
                queue_prewarm(min(state.capacity * 2, cfg.raster.capacity),
                              track_now, cams, gts)
            # track_stats flips once at densify_until_iter: warm it ahead
            if track_now and opt.densify_until_iter - it <= 300:
                queue_prewarm(state.capacity, False, cams, gts)

        if mesh is not None:
            from fourdgs_tpu.parallel.sharded import sharded_train_step
            state, loss, saux = sharded_train_step(
                state, cams, gts, bg, mesh=mesh, stage=stage,
                active_sh=active_sh, raster_cfg=raster_cfg,
                deform_cfg=deform_cfg, tx=tx, reg_weights=reg_weights,
                lambda_dssim=float(opt.lambda_dssim))
            aux = StepAux(loss=loss, l1=saux.l1, psnr=saux.psnr,
                          image=jnp.zeros((1, 1, 3)),
                          dropped_pairs=saux.dropped_pairs,
                          dropped_tile=saux.dropped_tile,
                          # wire visibility through so the collapse guard
                          # below protects mesh runs too (ShardedAux.visible
                          # is replicated across the mesh)
                          n_visible=saux.visible.sum(),
                          max_alpha=saux.max_alpha)
        else:
            state, aux = train_step(
                state, cams, gts, bg, jnp.int32(active_sh), stage=stage,
                raster_cfg=raster_cfg, deform_cfg=deform_cfg, tx=tx,
                lambda_dssim=float(opt.lambda_dssim),
                reg_weights=reg_weights,
                track_stats=it < opt.densify_until_iter)

        # NaN guard: roll back to the last known-good state instead of the
        # reference's full process re-exec (ref train.py:220-222).
        if it % nan_check_every == 0 or it == iterations:
            # Four divergence signatures: non-finite loss, NaN-poisoned
            # params, total visibility collapse (all gaussians culled),
            # and CONTRIBUTION collapse — gaussians still project
            # (radii > 0) but every per-pixel alpha sits below the 1/255
            # compositing gate, so the render is pure background, the loss
            # is finite, and every photometric gradient is exactly zero.
            # The latter froze synth_mv_r3 for 9k iterations while the
            # radii-based n_visible stayed at 23k (VERDICT r3 weak #2).
            collapsed = (int(np.asarray(aux.n_visible)) == 0
                         and n_alive > 0)
            gate_collapsed = (float(aux.max_alpha) <= 0.0 and n_alive > 0)
            healthy = (np.isfinite(float(aux.loss))
                       and not collapsed and not gate_collapsed
                       and int(_param_nan_count(state)) == 0)
            if not healthy:
                rollbacks += 1
                if rollbacks >= 3:
                    raise FloatingPointError(
                        f"training diverged at {stage} iteration {it} after "
                        f"{rollbacks - 1} rollbacks"
                        + (" (visibility collapse)" if collapsed else
                           " (contribution collapse: no gaussian passes the"
                           " alpha gate)" if gate_collapsed else ""))
                print(f"[{stage} {it}] "
                      + ("all gaussians culled" if collapsed
                         else "zero blend contribution (alpha-gate collapse)"
                         if gate_collapsed else "loss non-finite")
                      + f"; rolling back {it - last_good_it} iterations")
                state = last_good
                n_alive = int(state.alive.sum())
                # resample the batch order so the retry takes a different
                # trajectory instead of replaying the diverging batches
                perm = next_epoch()
                ptr = 0
            else:
                last_good, last_good_it = state, it
                rollbacks = 0  # only consecutive failures count as divergence

            # --- binner overflow auto-grow ---
            # The reference's CUDA buffers grow dynamically
            # (ref rasterizer resizeFunctional); our static caps DROP the
            # furthest pairs instead, which must never ship silently in a
            # quality run (synth_mono_r3 trained with 11k-36k drops/step).
            # Growth doubles the overflowing cap and recompiles (one stall,
            # same mechanism as capacity buckets); piggybacks on the guard
            # sync so it costs no extra device round-trip.
            dp = int(jnp.asarray(aux.dropped_pairs))
            dt = int(jnp.asarray(aux.dropped_tile))
            if cfg.raster.autogrow and (dp or dt):
                changes = {}
                # dropped_tile is an UPPER BOUND (any-unsaturated-pixel
                # test): a handful of counted pairs is usually excess
                # behind covered-but-unsaturated edge pixels, and growing
                # the cap doubles every per-slot table + forces a
                # recompile. Grow only past a materiality threshold of
                # 0.5% of the step's pairs (observed: growth to tile_cap
                # 8192 on 85 of ~1M pairs halved a whole run's step rate).
                npairs = max(int(jnp.asarray(aux.num_pairs)), 1)
                if (dt > max(64, npairs // 200)
                        and raster_cfg.tile_cap < 8192):
                    changes["tile_cap"] = min(raster_cfg.tile_cap * 2, 8192)
                if dp and raster_cfg.bin_pairs_per_chunk < (1 << 18):
                    changes["bin_pairs_per_chunk"] = min(
                        raster_cfg.bin_pairs_per_chunk * 2, 1 << 18)
                if changes:
                    raster_cfg = dataclasses.replace(raster_cfg, **changes)
                    last_cap_change = it
                    print(f"[{stage} {it}] binner overflow ({dp} pairs / "
                          f"{dt} tile-cap): growing {changes} (recompile)")
                    # the prewarmed next-bucket executable (if any) was
                    # lowered for the OLD config; re-queue with the new one
                    if (prewarmer is not None
                            and state.capacity < cfg.raster.capacity
                            and n_alive * headroom * 2 > state.capacity):
                        queue_prewarm(
                            min(state.capacity * 2, cfg.raster.capacity),
                            it < opt.densify_until_iter, cams, gts)
            # --- tile_cap auto-SHRINK ---
            # Startup configs size tile_cap for the worst scene (e.g. the
            # synth_mv default 2048 vs measured peaks ~300): every
            # per-slot table (gidx, pack gather, blend grads) carries the
            # oversize for the whole run. Hysteresis must be STRONG: after
            # every opacity reset the scene turns translucent, saturation
            # stops masking far pairs and the needed cap spikes toward the
            # TRUE peak (observed on synth_mv: shrink 2048 -> 512 followed
            # by materiality growth back to 4096, five recompiles). Shrink
            # only at 4x oversize and 2000-iter spacing from any change.
            elif cfg.raster.autogrow:
                peak = int(jnp.asarray(aux.tile_peak))
                if (peak > 0 and raster_cfg.tile_cap > 256
                        and peak * 4 < raster_cfg.tile_cap
                        and it - last_cap_change
                        >= cfg.raster.cap_shrink_spacing):
                    raster_cfg = dataclasses.replace(
                        raster_cfg, tile_cap=raster_cfg.tile_cap // 2)
                    last_cap_change = it
                    print(f"[{stage} {it}] tile peak {peak} << cap: "
                          f"shrinking tile_cap to {raster_cfg.tile_cap} "
                          f"(recompile)")

        # --- densification schedule (ref train.py:259-285) ---
        if it < opt.densify_until_iter:
            if stage == "coarse":
                op_thresh = opt.opacity_threshold_coarse
                dense_thresh = opt.densify_grad_threshold_coarse
            else:
                frac = it / opt.densify_until_iter
                op_thresh = (opt.opacity_threshold_fine_init
                             - frac * (opt.opacity_threshold_fine_init
                                       - opt.opacity_threshold_fine_after))
                dense_thresh = (opt.densify_grad_threshold_fine_init
                                - frac * (opt.densify_grad_threshold_fine_init
                                          - opt.densify_grad_threshold_after))

            did_surgery = False
            if (it > opt.densify_from_iter
                    and it % opt.densification_interval == 0
                    and n_alive < opt.densify_max_points):
                # grow bucket first so clones/splits find free slots
                bucket = bucket_for(n_alive)
                if bucket != state.capacity:
                    state = compact_and_resize(state, bucket)
                key, sub = jax.random.split(key)
                state, dstats = densify_mod.densify(
                    state, sub, float(dense_thresh), opt.percent_dense,
                    extent, opt.densify_max_points)
                did_surgery = True
                n_alive = int(state.alive.sum())
            if (it > opt.pruning_from_iter
                    and it % opt.pruning_interval == 0
                    and n_alive > opt.prune_min_points):
                size_thresh = 20 if it > opt.opacity_reset_interval else None
                state = densify_mod.prune(state, float(op_thresh), extent,
                                          size_thresh, opt.prune_min_points)
                did_surgery = True
                n_alive = int(state.alive.sum())
            if (opt.add_point and it % opt.densification_interval == 0
                    and n_alive < opt.densify_max_points):
                key, sub = jax.random.split(key)
                state, _ = densify_mod.grow(
                    state, sub, max_points=opt.densify_max_points)
                did_surgery = True
                n_alive = int(state.alive.sum())
            if it % opt.opacity_reset_interval == 0:
                state = densify_mod.reset_opacity(state)
            if did_surgery:
                # re-bucket downward is rare; keep compact for slicing
                bucket = bucket_for(n_alive)
                if bucket != state.capacity:
                    state = compact_and_resize(state, bucket)

        # periodic eval/save/checkpoint, excluded from reported train time
        # (the reference's pausable Timer, ref train.py:242-257)
        if ((it in test_iterations and on_test)
                or (it in save_iterations and on_save)
                or (it in checkpoint_iterations and on_checkpoint)):
            tp = time.perf_counter()
            if it in test_iterations and on_test:
                # pass the LIVE raster cfg when the callback takes it:
                # after cap auto-growth the closure-captured original
                # config would silently DROP pairs in eval renders
                # (observed: coarse evals losing ~80k pairs/render and
                # reading 14-27 dB below the training-path render)
                if _takes_raster_cfg(on_test):
                    on_test(it, state, active_sh, raster_cfg=raster_cfg)
                else:
                    on_test(it, state, active_sh)
            if it in save_iterations and on_save:
                on_save(it, state)
            if it in checkpoint_iterations and on_checkpoint:
                on_checkpoint(it, state, active_sh)
            paused += time.perf_counter() - tp

        if it % log_every == 0 or it == iterations:
            tp = time.perf_counter()
            dropped_pairs = int(jnp.asarray(aux.dropped_pairs))
            dropped_tile = int(jnp.asarray(aux.dropped_tile))
            rec = dict(stage=stage, iter=it, loss=float(aux.loss),
                       l1=float(aux.l1), psnr=float(aux.psnr),
                       points=n_alive,
                       capacity=state.capacity,
                       elapsed=tp - t0 - paused,
                       # binner overflow telemetry (ref has none — CUDA
                       # buffers grow dynamically; our fixed caps drop the
                       # furthest pairs, which must not happen silently)
                       dropped_pairs=dropped_pairs,
                       dropped_tile=dropped_tile,
                       num_pairs=int(jnp.asarray(aux.num_pairs)),
                       # divergence telltales (cheap reductions)
                       rot_max=float(jnp.abs(
                           state.params["gauss"].rotation).max()),
                       op_max=float(state.params["gauss"].opacity.max()),
                       visible=int(np.asarray(aux.n_visible)),
                       max_alpha=float(aux.max_alpha),
                       grid_absmax=float(_grid_absmax(
                           state.params["deform"]["grid"]))
                       if "deform" in state.params else 0.0)
            np_rec = int(jnp.asarray(aux.num_pairs))
            if dropped_pairs or dropped_tile > max(64, np_rec // 200):
                print(f"[{stage} {it}] WARNING: binner overflow — "
                      f"{dropped_pairs} pairs / {dropped_tile} tile-cap "
                      f"drops this step; raise tile_cap/pair_cap or the "
                      f"scene will lose far gaussians")
            history.append(rec)
            if log_fn:
                log_fn(rec)
            paused += time.perf_counter() - tp

    return StageResult(state=state, history=history,
                       wall_time=time.perf_counter() - t0 - paused,
                       active_sh=active_sh, raster_cfg=raster_cfg)
