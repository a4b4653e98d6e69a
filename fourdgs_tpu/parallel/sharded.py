"""Multi-chip training step: shard_map over a ("data", "tile") mesh.

Greenfield TPU design (the reference is single-GPU, SURVEY.md §5.8):

  * cameras are data-parallel over "data" (each rank renders its slice of
    the batch);
  * within a camera, the rasterizer's per-tile compositing and the
    ground-truth tiles are sharded over "tile" — the blend, the pixel loss
    and the backward scatter of per-gaussian gradients all run on 1/n_tile
    of the tiles per rank;
  * parameters are replicated; their gradients arrive by the automatic
    psum that differentiating shard_map inserts for replicated inputs
    (pixel-loss partial sums are psummed over both axes in the forward, so
    the loss scalar is replicated and the backward collective rides ICI).

Deformation + SH + projection are GAUSSIAN-sharded over "tile" (each rank
deforms/projects cap/n_tile gaussians, then all_gathers the projected
set), so the per-gaussian work scales down with the tile axis; binning is
TILE-sharded too (each rank clips rects to its band of tile rows and bins
only its num_tiles/n_tile tiles — clip_proj_to_tile_rows), falling back to
replicated binning only when n_tile doesn't divide the tile-row count.
The SSIM loss term needs full images, so the rendered tiles are
all_gathered across "tile" with a 1/n_tile weight on the local term to
keep the psum'd parameter gradients exact (see `_ssim_term`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.models.deformation import DeformConfig, deform_apply
from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.models.regularization import compute_regulation
from fourdgs_tpu.ops import losses, sh as sh_ops
from fourdgs_tpu.ops import transforms
from fourdgs_tpu.ops.projection import Projected, project_gaussians
from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig, _make_blend,
                                             _tile_pixel_coords, _untile,
                                             bin_gaussians,
                                             clip_proj_to_tile_rows,
                                             tile_image)


class ShardedAux(NamedTuple):
    l1: jnp.ndarray
    psnr: jnp.ndarray
    radii: jnp.ndarray       # (cap,) max over batch
    visible: jnp.ndarray     # (cap,) any over batch
    dropped_pairs: jnp.ndarray = 0   # () int32, summed over global batch
    dropped_tile: jnp.ndarray = 0
    max_alpha: jnp.ndarray = 1.0     # () max accumulated alpha over every
    #                                  pixel (contribution-collapse signal,
    #                                  see loop.StepAux.max_alpha)


def _render_tiles_local(params, cfg: RasterConfig, deform_cfg: DeformConfig,
                        aabb, alive, active_sh: int, stage: str, camera,
                        bg, ndc_offset, n_tile: int):
    """Per-device, per-camera: render this rank's tile slice.

    The per-gaussian pipeline (deformation, SH->RGB, EWA projection) runs
    on a cap/n_tile slice of the gaussian set per tile rank; the projected
    attributes are then all_gathered so every rank can bin and blend.
    Gradients stay exact: slicing a replicated input zero-pads in the
    backward and the shard_map psum of parameter grads re-assembles the
    full per-gaussian gradient, while all_gather's psum_scatter backward
    delivers each rank the summed cotangent of exactly its slice.

    Returns (color_tiles, t_tiles, depth_tiles, radii)."""
    gauss: GaussianParams = params["gauss"]
    cap = gauss.xyz.shape[0]
    shard_gauss = n_tile > 1 and cap % n_tile == 0
    if shard_gauss:
        sl = cap // n_tile
        lo = jax.lax.axis_index("tile") * sl

        def tslice(x):
            return jax.lax.dynamic_slice_in_dim(x, lo, sl, 0)

        gauss = GaussianParams(*[tslice(getattr(gauss, f))
                                 for f in GaussianParams._fields])
        alive = tslice(alive)
        ndc_offset = tslice(ndc_offset)
    shs = gauss.features()
    if stage == "fine":
        xyz, scaling, rotation, opacity, shs = deform_apply(
            params["deform"], deform_cfg, aabb, gauss.xyz, gauss.scaling,
            gauss.rotation, gauss.opacity, shs, camera.time)
    else:
        xyz, scaling, rotation, opacity = (gauss.xyz, gauss.scaling,
                                           gauss.rotation, gauss.opacity)
    scales = transforms.safe_exp_scales(scaling)
    quats = transforms.quat_normalize(rotation)
    opacities = jax.nn.sigmoid(opacity[:, 0])
    dirs = xyz - camera.cam_center
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    colors = sh_ops.sh_to_rgb(active_sh, shs, dirs)

    proj = project_gaussians(xyz, scales, quats, camera, cfg.img_width,
                             cfg.img_height, cfg.tile_size,
                             ndc_offset=ndc_offset, alive=alive,
                             opacities=opacities)
    if shard_gauss:
        def gather(x):
            return jax.lax.all_gather(x, "tile", axis=0, tiled=True)

        proj = Projected(*[gather(f) for f in proj])
        colors = gather(colors)
        opacities = gather(opacities)
    nt_local = cfg.num_tiles // n_tile
    rank = jax.lax.axis_index("tile")
    start = rank * nt_local
    proj_sg = jax.tree.map(jax.lax.stop_gradient, proj)
    slots = None
    if (cfg.binner == "count" and n_tile > 1
            and cfg.grid_y % n_tile == 0):
        # tile-axis-sharded binning: each rank clips the rects to its band
        # of tile rows and bins ONLY its num_tiles/n_tile tiles (the
        # contiguous tile-id ranges used for gidx/px/gts slicing are whole
        # row bands exactly when n_tile divides grid_y). Binner cost —
        # a third of the single-chip step — now scales with the tile axis
        # instead of running replicated on every rank, and the local slot
        # metadata re-enables the reassociated (scatter-free) blend
        # backward that the replicated path had to give up.
        rows_local = cfg.grid_y // n_tile
        proj_local = clip_proj_to_tile_rows(proj_sg, rank * rows_local,
                                            rows_local)
        binned = jax.tree.map(
            jax.lax.stop_gradient,
            bin_gaussians(proj_local, cfg, num_tiles=nt_local))
        gidx = binned.gidx
        slots = binned.slots
    else:
        # fallback (sort binner, or n_tile doesn't divide the tile rows):
        # replicated global binning, slice this rank's tiles after
        binned = jax.tree.map(jax.lax.stop_gradient,
                              bin_gaussians(proj_sg, cfg))
        gidx = jax.lax.dynamic_slice_in_dim(binned.gidx, start, nt_local, 0)
    px_all, py_all = _tile_pixel_coords(cfg)
    px = jax.lax.dynamic_slice_in_dim(px_all, start, nt_local, 0)
    py = jax.lax.dynamic_slice_in_dim(py_all, start, nt_local, 0)

    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from fourdgs_tpu.ops.pallas import blend as pallas_blend
        blend = pallas_blend.make_blend(cfg)
    else:
        blend = _make_blend(cfg)
    color_t, depth_t, t_t = blend(gidx, px, py, proj.pix, proj.conic, colors,
                                  opacities, proj.depth, slots)
    color_t = color_t + t_t[..., None] * bg
    # effective tile-cap drops (excess where some local pixel is
    # unsaturated) — same semantics as rasterize(); the fallback path's
    # overflow vector covers all tiles, slice this rank's band
    from fourdgs_tpu.ops.rasterize_ref import T_MIN
    overflow = binned.overflow
    if overflow is not None:
        if overflow.shape[0] != gidx.shape[0]:
            overflow = jax.lax.dynamic_slice_in_dim(
                overflow, start, gidx.shape[0], 0)
        unsat = (jax.lax.stop_gradient(t_t) > T_MIN).any(axis=1)
        dropped_tile = (overflow * unsat).sum()
    else:
        dropped_tile = binned.dropped_tile
    return (color_t, t_t, depth_t, proj.radius,
            binned.dropped_pairs, dropped_tile)


def make_sharded_loss(mesh: Mesh, cfg: RasterConfig,
                      deform_cfg: DeformConfig, stage: str, active_sh: int,
                      reg_weights: tuple, lambda_dssim: float = 0.0):
    """Returns loss_fn(params, ndc_offset, alive, aabb, cameras, gts_tiled,
    bg) -> (loss, aux). cameras/gts are GLOBAL batch arrays; sharding is
    handled inside."""
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]
    assert cfg.num_tiles % n_tile == 0, (cfg.num_tiles, n_tile)
    assert cfg.img_width % cfg.tile_size == 0 and \
        cfg.img_height % cfg.tile_size == 0, \
        "sharded path requires tile-aligned image dims"
    pixels_per_image = cfg.img_width * cfg.img_height

    def body(params, ndc_offset, alive, aabb, cameras, gts_tiled, bg):
        # cameras: local (B_local,) pytree; gts_tiled: (B_local, nt_local, P, 3)
        def one(cam):
            return _render_tiles_local(params, cfg, deform_cfg, aabb, alive,
                                       active_sh, stage, cam, bg, ndc_offset,
                                       n_tile)

        # batch-1 bypass, same rationale as loop.train_step: vmap over a
        # single-camera axis pessimizes the binner's scatters on TPU.
        b_loc = jax.tree.leaves(cameras)[0].shape[0]
        if b_loc == 1:
            color_t, t_t, depth_t, radii, drop_p, drop_t = jax.tree.map(
                lambda x: x[None], one(jax.tree.map(lambda x: x[0], cameras)))
        else:
            color_t, t_t, depth_t, radii, drop_p, drop_t = \
                jax.vmap(one)(cameras)
        abs_err = jnp.abs(color_t - gts_tiled)
        l1_partial = abs_err.sum()
        sq_partial = ((color_t - gts_tiled) ** 2).sum(axis=(1, 2, 3))

        b_local = gts_tiled.shape[0]
        b_global = b_local * n_data
        denom = b_global * pixels_per_image * 3
        l1 = jax.lax.psum(l1_partial, ("data", "tile")) / denom

        # per-image PSNR, then mean over the global batch
        mse = jax.lax.psum(sq_partial, "tile") / (pixels_per_image * 3)
        psnr = jax.lax.pmean(
            (20.0 * jnp.log10(1.0 / jnp.sqrt(mse))).mean(), "data")
        psnr = jax.lax.pmean(psnr, "tile")

        loss = l1
        if stage == "fine" and reg_weights[0] != 0:
            time_w, l1_w, tv_w = reg_weights
            loss = loss + compute_regulation(params["deform"]["grid"],
                                             time_w, l1_w, tv_w)
        if lambda_dssim != 0:
            # SSIM needs whole images: all_gather the rendered + gt tiles
            # along "tile" and untile. Every tile rank computes the same
            # term, so scale it by 1/n_tile — the shard_map backward psums
            # parameter grads over ranks, and all_gather's psum_scatter VJP
            # then hands each rank exactly its slice's cotangent (summed
            # over the n_tile identical copies), keeping gradients equal
            # to the single-device step (ref train.py:212-214).
            color_full = jax.lax.all_gather(color_t, "tile", axis=1,
                                            tiled=True)
            gts_full = jax.lax.all_gather(gts_tiled, "tile", axis=1,
                                          tiled=True)
            imgs = jax.vmap(lambda x: _untile(x, cfg))(color_full)
            gt_imgs = jax.vmap(lambda x: _untile(x, cfg))(gts_full)
            term = lambda_dssim * (1.0 - losses.ssim(imgs, gt_imgs)) / n_tile
            loss = loss + jax.lax.pmean(jax.lax.psum(term, "tile"), "data")

        radii = jax.lax.pmax(radii.max(axis=0), "data")
        radii = jax.lax.pmax(radii, "tile")  # identical; keeps rep invariant
        # with tile-sharded binning each rank counts only its own tiles'
        # drops (a pair belongs to exactly one tile), so sum over BOTH
        # axes; on the replicated fallback the tile-axis values are
        # identical and the psum over "tile" merely scales the count —
        # still nonzero exactly when drops happened
        drops = jax.lax.psum(jnp.stack([drop_p.sum(), drop_t.sum()]),
                             ("data", "tile"))
        max_alpha = jax.lax.stop_gradient(jax.lax.pmax(
            jax.lax.pmax(jax.lax.stop_gradient(1.0 - t_t).max(), "tile"),
            "data"))
        aux = ShardedAux(l1=l1, psnr=psnr, radii=radii, visible=radii > 0,
                         dropped_pairs=drops[0], dropped_tile=drops[1],
                         max_alpha=max_alpha)
        return loss, aux

    cam_spec = jax.tree.map(lambda _: P("data"), Camera(*Camera._fields))
    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), cam_spec, P("data", "tile"), P()),
        out_specs=(P(), ShardedAux(l1=P(), psnr=P(), radii=P(), visible=P(),
                                   dropped_pairs=P(), dropped_tile=P(),
                                   max_alpha=P())),
        check_vma=False)
    return smapped


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "stage", "active_sh", "raster_cfg", "deform_cfg",
                     "tx", "reg_weights", "lambda_dssim"))
def sharded_train_step(state, cameras, gts, bg, *, mesh: Mesh, stage: str,
                       active_sh: int, raster_cfg: RasterConfig,
                       deform_cfg: DeformConfig, tx, reg_weights: tuple,
                       lambda_dssim: float = 0.0):
    """Full train step over the mesh: sharded forward/backward, replicated
    optimizer update, densification-stat accumulation."""
    loss_fn = make_sharded_loss(mesh, raster_cfg, deform_cfg, stage,
                                active_sh, reg_weights,
                                lambda_dssim=lambda_dssim)
    cap = state.capacity
    gts_tiled = jax.vmap(lambda im: tile_image(im, raster_cfg))(gts)
    gts_tiled = gts_tiled.reshape(gts.shape[0], raster_cfg.num_tiles, -1, 3)

    def wrapped(params, ndc_offset):
        return loss_fn(params, ndc_offset, state.alive, state.aabb, cameras,
                       gts_tiled, bg)

    ndc_offset = jnp.zeros((cap, 2))
    (loss, aux), (grads, ndc_grad) = jax.value_and_grad(
        wrapped, argnums=(0, 1), has_aux=True)(state.params, ndc_offset)

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    gnorm = jnp.linalg.norm(ndc_grad, axis=-1)
    new_state = state._replace(
        params=params, opt_state=opt_state, step=state.step + 1,
        max_radii2d=jnp.where(aux.visible,
                              jnp.maximum(state.max_radii2d, aux.radii),
                              state.max_radii2d),
        xyz_gradient_accum=state.xyz_gradient_accum
        + jnp.where(aux.visible, gnorm, 0.0),
        denom=state.denom + aux.visible.astype(jnp.float32),
    )
    return new_state, loss, aux


@functools.lru_cache(maxsize=8)
def _make_sharded_render(mesh: Mesh, cfg: RasterConfig,
                         deform_cfg: DeformConfig, stage: str,
                         active_sh: int):
    n_tile = mesh.shape["tile"]

    def body(params, alive, aabb, camera, bg):
        cap = params["gauss"].xyz.shape[0]
        color_t, t_t, depth_t, *_ = _render_tiles_local(
            params, cfg, deform_cfg, aabb, alive, active_sh, stage, camera,
            bg, jnp.zeros((cap, 2)), n_tile)
        color_t = jax.lax.all_gather(color_t, "tile", axis=0, tiled=True)
        depth_t = jax.lax.all_gather(depth_t, "tile", axis=0, tiled=True)
        t_t = jax.lax.all_gather(t_t, "tile", axis=0, tiled=True)
        return (_untile(color_t, cfg), _untile(depth_t, cfg),
                1.0 - _untile(t_t, cfg))

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False))


def sharded_eval_render(state, camera: Camera, bg, *, mesh: Mesh,
                        raster_cfg: RasterConfig, deform_cfg: DeformConfig,
                        stage: str, active_sh: int):
    """Tile-sharded novel-view render (eval/render-CLI counterpart of
    loop.eval_step): the per-gaussian pipeline and the blend are split
    across the mesh's "tile" axis, and the assembled (H, W) image/depth/
    alpha are returned replicated."""
    fn = _make_sharded_render(mesh, raster_cfg, deform_cfg, stage, active_sh)
    return fn(state.params, state.alive, state.aabb, camera, bg)
