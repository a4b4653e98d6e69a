"""Adaptive density control on a fixed-capacity buffer.

The reference grows/shrinks tensors and performs torch-optimizer surgery
(ref scene/gaussian_model.py:390-506). With static XLA shapes, clone/split
write into FREE slots found by a rank-matching scatter, prune just clears
`alive`, and Adam moments of written slots are zeroed — the same semantics
as cat_tensors_to_optimizer (new points get fresh moments) without any
reallocation. Everything here is jittable.

Semantics replicated:
  clone (ref :443-456): grad-norm >= tau and max scale <= percent_dense *
    extent -> copy in place (original keeps its moments, copy gets fresh).
  split (ref :415-441): grad-norm >= tau and max scale > percent_dense *
    extent -> N=2 samples ~ Normal(0, scale) rotated into world, scale
    divided by 1.6; original slot is REPLACED by the first sample (the
    reference prunes the original and appends two), second goes to a free
    slot; both get fresh moments.
  prune (ref :489-498): opacity < min_opacity, optionally screen radius >
    max_screen_size or world scale > 0.1 * extent.
  opacity reset (ref :269-272): opacity <- inverse_sigmoid(min(op, 0.01)),
    opacity moments zeroed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fourdgs_tpu.models.gaussians import GaussianParams
from fourdgs_tpu.ops import transforms
from fourdgs_tpu.train import optim
from fourdgs_tpu.train.state import TrainState


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_dropped: jnp.ndarray   # candidates that found no free slot


def _alloc_free_slots(alive: jnp.ndarray, want: jnp.ndarray):
    """Match the i-th wanted source slot to the i-th free slot.

    Returns (dest, ok): dest[j] = buffer index allocated for source j (valid
    only where ok[j]); ok = want & (rank < n_free).
    """
    cap = alive.shape[0]
    free = ~alive
    n_free = free.sum()
    free_rank = jnp.cumsum(free) - 1              # rank of each free slot
    want_rank = jnp.cumsum(want) - 1              # rank of each source
    # dest_of_rank[r] = index of the r-th free slot
    idx = jnp.arange(cap, dtype=jnp.int32)
    dest_of_rank = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(free, free_rank, cap)].set(idx, mode="drop")
    ok = want & (want_rank < n_free)
    dest = dest_of_rank[jnp.clip(want_rank, 0, cap - 1)]
    return dest, ok


def _scatter_params(gauss: GaussianParams, src_vals: GaussianParams,
                    dest: jnp.ndarray, ok: jnp.ndarray) -> GaussianParams:
    cap = gauss.capacity
    safe_dest = jnp.where(ok, dest, cap)  # cap = dropped
    return GaussianParams(*[
        getattr(gauss, f).at[safe_dest].set(getattr(src_vals, f), mode="drop")
        for f in GaussianParams._fields])


def densify(state: TrainState, key: jax.Array, grad_threshold: float,
            percent_dense: float, extent: float, max_points: int
            ) -> tuple[TrainState, DensifyStats]:
    """Clone + split pass (ref densify(), scene/gaussian_model.py:501-506).
    `max_points` caps growth like the N<360k gate at ref train.py:270."""
    gauss: GaussianParams = state.params["gauss"]
    cap = state.capacity
    grads = jnp.where(state.denom > 0,
                      state.xyz_gradient_accum / jnp.maximum(state.denom, 1), 0.0)
    grads = jnp.nan_to_num(grads)
    scales = transforms.safe_exp_scales(gauss.scaling)
    max_scale = scales.max(axis=1)
    over = grads >= grad_threshold
    small = max_scale <= percent_dense * extent
    room = jnp.maximum(max_points - state.alive.sum(), 0)

    clone_mask = over & small & state.alive
    split_mask = over & ~small & state.alive

    # ---- clone: copy into free slots ----
    dest_c, ok_c = _alloc_free_slots(state.alive, clone_mask)
    # budget gate: limit total new points to `room`
    new_rank = jnp.cumsum(clone_mask) - 1
    ok_c = ok_c & (new_rank < room)
    new_gauss = _scatter_params(gauss, gauss, dest_c, ok_c)
    alive = state.alive.at[jnp.where(ok_c, dest_c, cap)].set(True, mode="drop")
    written = jnp.zeros((cap,), bool).at[
        jnp.where(ok_c, dest_c, cap)].set(True, mode="drop")
    n_cloned = ok_c.sum()

    # ---- split: original slot replaced by sample0, free slot gets sample1 ----
    n_clone_used = ok_c.sum()
    room2 = jnp.maximum(room - n_clone_used, 0)
    eps0 = jax.random.normal(key, (cap, 3)) * scales
    key2 = jax.random.fold_in(key, 1)
    eps1 = jax.random.normal(key2, (cap, 3)) * scales
    R = transforms.quat_to_rotmat(gauss.rotation)
    off0 = jnp.einsum("nij,nj->ni", R, eps0)
    off1 = jnp.einsum("nij,nj->ni", R, eps1)
    # 0.8 * N with N=2 (ref :432), computed directly in log space so a
    # zero/overflowed scale can never produce a +-inf parameter
    new_scaling = (jnp.minimum(gauss.scaling, transforms.SCALE_LOG_MAX)
                   - jnp.log(1.6))

    split_rank = jnp.cumsum(split_mask) - 1
    dest_s, ok_s = _alloc_free_slots(alive, split_mask)
    ok_s = ok_s & (split_rank < room2)

    # sample 0 overwrites the original slot — but only when the split
    # actually allocated its second sample (ok_s). The reference only
    # replaces/prunes originals when the split adds points; gating on ok_s
    # avoids repeatedly shrinking+jittering large gaussians with no
    # compensating second sample once capacity/budget is exhausted.
    sm = (split_mask & ok_s)[:, None]
    new_gauss = new_gauss._replace(
        xyz=jnp.where(sm, gauss.xyz + off0, new_gauss.xyz),
        scaling=jnp.where(sm, new_scaling, new_gauss.scaling),
    )
    # sample 1 to free slots
    src_vals = gauss._replace(xyz=gauss.xyz + off1, scaling=new_scaling)
    new_gauss = _scatter_params(new_gauss, src_vals, dest_s, ok_s)
    alive = alive.at[jnp.where(ok_s, dest_s, cap)].set(True, mode="drop")
    written = written | (split_mask & ok_s) \
        | jnp.zeros((cap,), bool).at[jnp.where(ok_s, dest_s, cap)].set(
            True, mode="drop")
    n_split = ok_s.sum()

    opt_state = optim.reset_moments_for_slots(state.opt_state, written,
                                             state.params)
    stats = DensifyStats(
        n_cloned=n_cloned, n_split=n_split,
        n_dropped=(clone_mask.sum() - n_cloned) + (split_mask.sum() - n_split))
    new_state = state._replace(
        params={**state.params, "gauss": new_gauss},
        opt_state=opt_state,
        alive=alive,
        xyz_gradient_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
        max_radii2d=jnp.zeros((cap,)),
    )
    return new_state, stats


def prune(state: TrainState, min_opacity: float, extent: float,
          max_screen_size: int | None, min_points: int) -> TrainState:
    """ref prune(), scene/gaussian_model.py:489-498; only runs while
    N > min_points (gate at ref train.py:274)."""
    gauss: GaussianParams = state.params["gauss"]
    opacity = jax.nn.sigmoid(gauss.opacity[:, 0])
    mask = opacity < min_opacity
    if max_screen_size:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.exp(gauss.scaling).max(axis=1) > 0.1 * extent
        mask = mask | big_vs | big_ws
    mask = mask & state.alive
    # never prune below min_points: keep the lowest-index survivors
    n_alive = state.alive.sum()
    do_prune = n_alive > min_points
    alive = jnp.where(do_prune, state.alive & ~mask, state.alive)
    return state._replace(alive=alive)


def grow(state: TrainState, key: jax.Array, displacement_scale: float = 1.0,
         quantile: float = 0.8, max_points: int = 360_000
         ) -> tuple[TrainState, jnp.ndarray]:
    """Density-based point growing (the `--add_point` path, ref
    GaussianModel.grow via utils/point_utils.py:77-130 at train.py:280-281):
    clone sparse-region points with a KNN-scaled positional perturbation.
    Appearance params are copied; moments of new slots reset."""
    from fourdgs_tpu.utils.point_grow import grow_points

    gauss: GaussianParams = state.params["gauss"]
    cap = state.capacity
    mask, new_xyz = grow_points(key, gauss.xyz, displacement_scale,
                                quantile=quantile)
    mask = mask & state.alive
    room = jnp.maximum(max_points - state.alive.sum(), 0)
    dest, ok = _alloc_free_slots(state.alive, mask)
    ok = ok & ((jnp.cumsum(mask) - 1) < room)
    src_vals = gauss._replace(xyz=new_xyz)
    new_gauss = _scatter_params(gauss, src_vals, dest, ok)
    alive = state.alive.at[jnp.where(ok, dest, cap)].set(True, mode="drop")
    written = jnp.zeros((cap,), bool).at[
        jnp.where(ok, dest, cap)].set(True, mode="drop")
    opt_state = optim.reset_moments_for_slots(state.opt_state, written,
                                             state.params)
    return state._replace(params={**state.params, "gauss": new_gauss},
                          opt_state=opt_state, alive=alive), ok.sum()


def reset_opacity(state: TrainState) -> TrainState:
    gauss: GaussianParams = state.params["gauss"]
    op = jax.nn.sigmoid(gauss.opacity)
    new_op = transforms.inverse_sigmoid(jnp.minimum(op, 0.01))
    new_gauss = gauss._replace(
        opacity=jnp.where(state.alive[:, None], new_op, gauss.opacity))
    opt_state = optim.reset_moments_for_slots(
        state.opt_state, jnp.ones((state.capacity,), bool), state.params,
        group="opacity")
    return state._replace(params={**state.params, "gauss": new_gauss},
                          opt_state=opt_state)
