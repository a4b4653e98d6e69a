"""Pallas TPU kernels for the per-tile alpha-compositing blend.

Same numerical semantics as the XLA blend (ops/rasterize_tiled.py, spec in
ops/rasterize_ref.py), as hand-scheduled kernels:

  * grid = (num_tiles, n_chunks); chunk attribute blocks stream through
    VMEM via the automatic pipeline while color/transmittance accumulators
    live in VMEM scratch across the chunk axis;
  * in-kernel layout is (K gaussians x P pixels) f32 — gaussian attributes
    broadcast from sublane columns, pixels ride the lane axis;
  * the order-dependent prefix transmittance is a Kogge-Stone scan over the
    sublane (gaussian) axis via pltpu.roll — no serial per-gaussian loop;
  * chunks whose entering transmittance is fully saturated skip their VPU
    work (DMA is already pipelined; compute is predicated off);
  * the backward kernel re-runs the forward recurrence with the suffix
    identity on gradient-projected scalars and emits per-(tile, slot)
    gradients; the scatter-add back to gaussians stays in XLA.

Attribute packing (per pair slot, 16 f32 lanes):
  [pix_x, pix_y, A, B, C, r, g, b, opacity, depth, 0...]
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourdgs_tpu.ops.rasterize_ref import ALPHA_MAX, ALPHA_MIN, T_MIN

ATTR_W = 16


def _scan_op(x, k, op, identity):
    """Inclusive Kogge-Stone scan along axis 1 (the gaussian/sublane axis
    of (T, K, P) blocks)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < k:
        shifted = pltpu.roll(x, d, 1)
        x = op(x, jnp.where(row >= d, shifted, identity))
        d *= 2
    return x


def _chunk_math(attrs, px, py, t_in):
    """Forward math for one chunk block. attrs (T, K, ATTR_W); px/py/t_in
    (T, 1, P). Returns (T, K, P) tensors + (T, 1, P) t_prod."""
    kk = attrs.shape[1]
    dx = attrs[:, :, 0:1] - px
    dy = attrs[:, :, 1:2] - py
    power = (-0.5 * (attrs[:, :, 2:3] * dx * dx + attrs[:, :, 4:5] * dy * dy)
             - attrs[:, :, 3:4] * dx * dy)
    alpha_u = jnp.where(power > 0.0, 0.0,
                        attrs[:, :, 8:9] * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.minimum(alpha_u, ALPHA_MAX)
    gated = alpha >= ALPHA_MIN
    g = jnp.where(gated, alpha, 0.0)
    cp_incl = _scan_op(1.0 - g, kk, jnp.multiply, 1.0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, cp_incl.shape, 1) == 0
    cp_excl = jnp.where(row0, 1.0, pltpu.roll(cp_incl, 1, 1))
    t_pref = t_in * cp_excl
    use = gated & (t_pref > T_MIN)
    au = jnp.where(use, alpha, 0.0)
    w = au * t_pref
    # Chunk transmittance product WITHOUT a second product scan: the used
    # set is a gated prefix (t_pref is monotone, so once it crosses T_MIN
    # every later entry is unused), hence prod(1 - au) over the chunk
    # equals cp_incl at the LAST used row — and cp_incl is monotone
    # non-increasing, so that's a masked min-reduce over the row axis
    # (identity 1.0 when nothing is used). Replaces 5 roll+multiply
    # passes with one native reduce.
    t_prod = jnp.min(jnp.where(use, cp_incl, 1.0), axis=1, keepdims=True)
    return alpha_u, alpha, use, w, t_pref, t_prod, dx, dy


def _fwd_kernel(need_ref, attrs_ref, px_ref, py_ref, color_ref, depth_ref,
                t_ref, acc_c, acc_d, acc_t, *, k, n_chunks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_c[:] = jnp.zeros_like(acc_c)
        acc_d[:] = jnp.zeros_like(acc_d)
        acc_t[:] = jnp.ones_like(acc_t)

    t_in = acc_t[:]                      # (T, 1, P)
    # skip chunks past this tile-block's occupancy (the index map also
    # clamps the DMA to a repeated block, so skipped chunks cost nothing)
    # and chunks whose entering transmittance is fully saturated
    live = (j < need_ref[pl.program_id(0)]) & (jnp.max(t_in) > T_MIN)

    @pl.when(live)
    def _():
        attrs = attrs_ref[:]
        _, _, _, w, _, t_prod, _, _ = _chunk_math(attrs, px_ref[:],
                                                  py_ref[:], t_in)
        rgb = [jnp.sum(w * attrs[:, :, 5 + c:6 + c], axis=1, keepdims=True)
               for c in range(3)]
        acc_c[:] = acc_c[:] + jnp.concatenate(rgb, axis=1)
        acc_d[:] = acc_d[:] + jnp.sum(w * attrs[:, :, 9:10], axis=1,
                                      keepdims=True)
        acc_t[:] = t_in * t_prod

    @pl.when(j == n_chunks - 1)
    def _():
        color_ref[:] = acc_c[:]
        depth_ref[:] = acc_d[:]
        t_ref[:] = acc_t[:]


def _bwd_kernel(need_ref, attrs_ref, px_ref, py_ref, gc_ref, gd_ref, gt_ref,
                rc_ref, rd_ref, tfin_ref, grads_ref,
                acc_cg, acc_dg, acc_t, *, k, n_chunks):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_cg[:] = jnp.zeros_like(acc_cg)
        acc_dg[:] = jnp.zeros_like(acc_dg)
        acc_t[:] = jnp.ones_like(acc_t)

    # Chunks past the tile-block's occupancy: no DMA (clamped index map),
    # no compute, and no write-back (the consumer masks untouched rows by
    # gidx == -1, so their content is never read).
    # Saturation skip (mirrors the forward): once every pixel of the block
    # has t <= T_MIN, all later chunks have use == false, so their grads
    # are exactly zero and the recurrence state (after_cg/after_dg via
    # w == 0, t via au == 0) is unchanged — write zeros, skip the VPU math.
    # Trained scenes saturate after a few chunks, so this removes most of
    # the backward's per-chunk work (the backward otherwise does full math
    # on every occupied chunk, unlike the forward).
    occupied = j < need_ref[pl.program_id(0)]
    live = occupied & (jnp.max(acc_t[:]) > T_MIN)

    @pl.when(occupied & ~live)
    def _():
        grads_ref[:] = jnp.zeros_like(grads_ref)

    @pl.when(live)
    def _():
        t_in = acc_t[:]
        attrs = attrs_ref[:]
        alpha_u, alpha, use, w, t_pref, t_prod, dx, dy = _chunk_math(
            attrs, px_ref[:], py_ref[:], t_in)

        gc = gc_ref[:]           # (T, 3, P)
        gd = gd_ref[:]           # (T, 1, P)
        gt = gt_ref[:]
        cg = (attrs[:, :, 5:6] * gc[:, 0:1] + attrs[:, :, 6:7] * gc[:, 1:2]
              + attrs[:, :, 7:8] * gc[:, 2:3])
        dg = attrs[:, :, 9:10] * gd
        after_cg = acc_cg[:] + _scan_op(w * cg, k, jnp.add, 0.0)
        after_dg = acc_dg[:] + _scan_op(w * dg, k, jnp.add, 0.0)

        one_m_a = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        da = jnp.where(
            use,
            t_pref * (cg + dg)
            - (rc_ref[:] - after_cg + rd_ref[:] - after_dg
               + gt * tfin_ref[:]) / one_m_a,
            0.0)
        d_op = da * jnp.where(attrs[:, :, 8:9] > 0,
                              alpha_u / jnp.maximum(attrs[:, :, 8:9], 1e-20),
                              0.0)
        d_pow = da * alpha_u

        def rsum(x):
            return jnp.sum(x, axis=2, keepdims=True)   # (T, K, 1)

        cols = [
            rsum(d_pow * -(attrs[:, :, 2:3] * dx + attrs[:, :, 3:4] * dy)),
            rsum(d_pow * -(attrs[:, :, 4:5] * dy + attrs[:, :, 3:4] * dx)),
            rsum(-0.5 * d_pow * dx * dx),
            rsum(-d_pow * dx * dy),
            rsum(-0.5 * d_pow * dy * dy),
            rsum(w * gc[:, 0:1]),
            rsum(w * gc[:, 1:2]),
            rsum(w * gc[:, 2:3]),
            rsum(d_op),
            rsum(w * gd),
        ]
        t_blk = attrs.shape[0]
        out = jnp.concatenate(
            cols + [jnp.zeros((t_blk, k, ATTR_W - len(cols)), jnp.float32)],
            axis=2)
        grads_ref[:] = out

        acc_cg[:] = after_cg[:, k - 1:k, :]
        acc_dg[:] = after_dg[:, k - 1:k, :]
        acc_t[:] = t_in * t_prod


def _bwd_fused_kernel(need_ref, idx_ref, attrs_ref, px_ref, py_ref, gc_ref,
                      gd_ref, gt_ref, rc_ref, rd_ref, tfin_ref, acc_ref,
                      rows_ref, acc_cg, acc_dg, acc_t, *, k, n_chunks,
                      unroll):
    """Blend backward with the per-gaussian gradient reduction FUSED into
    the kernel: instead of emitting the (num_tiles, tile_cap, 16) per-slot
    gradient table (20.5 MB at the bench point) for an XLA-side
    reassociation/scatter pass, each live chunk's rows are serially
    accumulated into a VMEM-resident per-gaussian table. Kills both the
    grads materialization and the gather+cumsum reassociation
    (rasterize_tiled.reassociate_pair_grads) behind it.

    LANE PACKING (the part that makes this legal): a naive (n_out, 16)
    f32 accumulator is lane-padded by Mosaic's T(8, 128) tiling to
    (n_out, 128) — 64 MiB of scoped VMEM at n_out = 131k, an 8x blowup
    that either fails to compile or spills catastrophically. Instead the
    accumulator is ((n_out+7)//8, 128): gaussian i lives at row i//8,
    lanes 16*(i%8) .. 16*(i%8)+16. Each per-slot gradient row is written
    to the rows scratch TILED 8x across lanes, and the serial add selects
    the right 16-lane slot with an iota mask — all dense VPU work, no
    dynamic lane slicing. The caller unpacks with one reshape. Requires
    the packed table to fit VMEM (scatter.fits_vmem on the packed shape);
    callers fall back to the per-slot path otherwise."""
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((t == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _():
        acc_cg[:] = jnp.zeros_like(acc_cg)
        acc_dg[:] = jnp.zeros_like(acc_dg)
        acc_t[:] = jnp.ones_like(acc_t)

    occupied = j < need_ref[t]
    live = occupied & (jnp.max(acc_t[:]) > T_MIN)

    @pl.when(live)
    def _():
        t_in = acc_t[:]
        attrs = attrs_ref[:]
        alpha_u, alpha, use, w, t_pref, t_prod, dx, dy = _chunk_math(
            attrs, px_ref[:], py_ref[:], t_in)
        gc = gc_ref[:]
        gd = gd_ref[:]
        gt = gt_ref[:]
        cg = (attrs[:, :, 5:6] * gc[:, 0:1] + attrs[:, :, 6:7] * gc[:, 1:2]
              + attrs[:, :, 7:8] * gc[:, 2:3])
        dg = attrs[:, :, 9:10] * gd
        after_cg = acc_cg[:] + _scan_op(w * cg, k, jnp.add, 0.0)
        after_dg = acc_dg[:] + _scan_op(w * dg, k, jnp.add, 0.0)

        one_m_a = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
        da = jnp.where(
            use,
            t_pref * (cg + dg)
            - (rc_ref[:] - after_cg + rd_ref[:] - after_dg
               + gt * tfin_ref[:]) / one_m_a,
            0.0)
        d_op = da * jnp.where(attrs[:, :, 8:9] > 0,
                              alpha_u / jnp.maximum(attrs[:, :, 8:9], 1e-20),
                              0.0)
        d_pow = da * alpha_u

        def rsum(x):
            return jnp.sum(x, axis=2, keepdims=True)

        cols = [
            rsum(d_pow * -(attrs[:, :, 2:3] * dx + attrs[:, :, 3:4] * dy)),
            rsum(d_pow * -(attrs[:, :, 4:5] * dy + attrs[:, :, 3:4] * dx)),
            rsum(-0.5 * d_pow * dx * dx),
            rsum(-d_pow * dx * dy),
            rsum(-0.5 * d_pow * dy * dy),
            rsum(w * gc[:, 0:1]),
            rsum(w * gc[:, 1:2]),
            rsum(w * gc[:, 2:3]),
            rsum(d_op),
            rsum(w * gd),
        ]
        t_blk = attrs.shape[0]
        out = jnp.concatenate(
            cols + [jnp.zeros((t_blk, k, ATTR_W - len(cols)), jnp.float32)],
            axis=2)
        # tile each 16-lane row 8x across the 128 lanes; the add below
        # masks out everything but the destination's lane slot
        out = out.reshape(t_blk * k, ATTR_W)
        rows_ref[:] = jnp.concatenate([out] * (128 // ATTR_W), axis=1)

        acc_cg[:] = after_cg[:, k - 1:k, :]
        acc_dg[:] = after_dg[:, k - 1:k, :]
        acc_t[:] = t_in * t_prod

        n_rows = t_blk * k
        off = j * n_rows
        lane_slot = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) // ATTR_W

        def body(r, _):
            base = r * unroll
            for u in range(unroll):
                i = idx_ref[0, 0, off + base + u]
                acc_ref[pl.ds(i // 8, 1), :] += jnp.where(
                    lane_slot == i % 8,
                    rows_ref[pl.ds(base + u, 1), :], 0.0)
            return 0

        jax.lax.fori_loop(0, n_rows // unroll, body, 0)


def pack_attr_table(pix, conic, color, opacity, depth):
    """(N+1, ATTR_W) per-gaussian packed attribute table with an all-zero
    sentinel row at N (opacity 0 == no contribution) — the row source for
    both the pack gather below and the binner's fused-attr scatter."""
    n = pix.shape[0]
    table = jnp.concatenate([
        pix, conic, color, opacity[:, None], depth[:, None],
        jnp.zeros((n, ATTR_W - 10), jnp.float32)], axis=1)
    return jnp.concatenate([table, jnp.zeros((1, ATTR_W), jnp.float32)],
                           axis=0)


def _pack_attrs(gidx, pix, conic, color, opacity, depth):
    """Per-pair attribute blocks via ONE row gather.

    Building 10 per-column gathers + a stack costs ~275 ms at production
    scale (19M scalar gathers + a 16-lane relayout). Instead: pack a
    (N+1, 16) per-gaussian table once (O(N)), append an all-zero sentinel
    row for padded slots, and do a single contiguous 64-byte row gather
    per pair slot. (The fused-attr binner mode skips this entirely — the
    binner scatters these rows itself.)"""
    n = pix.shape[0]
    table = pack_attr_table(pix, conic, color, opacity, depth)
    idx = jnp.where(gidx >= 0, gidx, n)
    return table[idx]


@functools.lru_cache(maxsize=None)
def make_blend(cfg):
    """Pallas counterpart of rasterize_tiled._make_blend (same signature)."""
    k = cfg.chunk
    p = cfg.pixels_per_tile
    assert cfg.tile_cap % k == 0
    n_chunks = cfg.tile_cap // k
    # tiles per grid step (amortizes per-step overhead); scale down for
    # bigger tiles so the pipelined VMEM blocks (~ t_blk * p) stay bounded.
    # t_blk 2 at p == 1024: the r4 A/B read 4 as +1.5%, but after the r5
    # binner corner cull the finer saturation/occupancy granularity wins
    # (16.08M vs 15.69M rays/s drop-free on the full bench; 8 fails to
    # lower). Tile-16 keeps the original 8.
    t_blk = int(os.environ.get("FOURDGS_BLEND_TBLK", 0)) or \
        (2 if p >= 1024 else max(1, (8 * 256) // p))
    interpret = jax.default_backend() != "tpu"

    def _pad_tiles(x):
        nt = x.shape[0]
        pad = (-nt) % t_blk
        if pad == 0:
            return x, nt
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), nt

    def _need_from_counts(counts):
        """Per tile-BLOCK number of live chunks (scalar-prefetch input).

        Padded slots are contiguous at the tail, so the live chunk count
        of a tile is ceil(count / k); a block of t_blk tiles processes the
        max over its tiles. Clamped to >= 1 so the index-map clamp below
        stays in range."""
        pad = (-counts.shape[0]) % t_blk
        counts = jnp.pad(counts, (0, pad))
        blk_max = counts.reshape(-1, t_blk).max(axis=1)
        return jnp.clip((blk_max + k - 1) // k, 1, n_chunks)

    def _need_chunks(gidx):
        return _need_from_counts((gidx >= 0).sum(axis=1).astype(jnp.int32))

    # chunk-axis index map: clamp to the block's last live chunk — Pallas
    # skips the DMA when the mapped block index repeats, so the padded
    # tail of every tile costs neither bandwidth nor compute
    _attr_map = lambda t, j, need: (t, jnp.minimum(j, need[t] - 1), 0)
    _tile_map = lambda t, j, need: (t, 0, 0)

    def _fwd_call(need, attrs, px, py):
        attrs, nt = _pad_tiles(attrs)
        px, _ = _pad_tiles(px)
        py, _ = _pad_tiles(py)
        ntp = attrs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntp // t_blk, n_chunks),
            in_specs=[
                pl.BlockSpec((t_blk, k, ATTR_W), _attr_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_blk, 1, p), _tile_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_blk, 1, p), _tile_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((t_blk, 3, p), _tile_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_blk, 1, p), _tile_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_blk, 1, p), _tile_map,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((t_blk, 3, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, k=k, n_chunks=n_chunks),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ntp, 3, p), jnp.float32),
                jax.ShapeDtypeStruct((ntp, 1, p), jnp.float32),
                jax.ShapeDtypeStruct((ntp, 1, p), jnp.float32),
            ],
            interpret=interpret,
        )(need, attrs, px, py)
        return [o[:nt] for o in out]

    def _bwd_call(need, attrs, px, py, gc, gd, gt, rc, rd, tfin):
        attrs, nt = _pad_tiles(attrs)
        args = [attrs]
        for x in (px, py, gc, gd, gt, rc, rd, tfin):
            xp, _ = _pad_tiles(x)
            args.append(xp)
        ntp = attrs.shape[0]
        tile1p = pl.BlockSpec((t_blk, 1, p), _tile_map,
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntp // t_blk, n_chunks),
            in_specs=[
                pl.BlockSpec((t_blk, k, ATTR_W), _attr_map,
                             memory_space=pltpu.VMEM),
                tile1p, tile1p,
                pl.BlockSpec((t_blk, 3, p), _tile_map,
                             memory_space=pltpu.VMEM),
                tile1p, tile1p, tile1p, tile1p, tile1p,
            ],
            out_specs=[
                pl.BlockSpec((t_blk, k, ATTR_W), _attr_map,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
            ],
        )
        grads = pl.pallas_call(
            functools.partial(_bwd_kernel, k=k, n_chunks=n_chunks),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ntp, n_chunks * k, ATTR_W),
                                     jnp.float32),
            ],
            interpret=interpret,
        )(need, *args)[0]
        return grads[:nt]

    def _bwd_call_fused(need, idx, attrs, px, py, gc, gd, gt, rc, rd, tfin,
                        n_out, unroll=8):
        """Fused backward: returns the (n_out, ATTR_W) per-gaussian table
        (unpacked from the kernel's 8-per-row lane-packed accumulator; see
        _bwd_fused_kernel). idx (nt, n_chunks*k) int32 in [0, n_out),
        sentinel rows land on n_out - 1."""
        n_pack = (n_out + 7) // 8
        attrs, nt = _pad_tiles(attrs)
        ntp = attrs.shape[0]
        pad = ntp - nt
        if pad:
            idx = jnp.pad(idx, ((0, pad), (0, 0)),
                          constant_values=n_out - 1)
        # (tile-block, 1, n_chunks * t_blk * k): one SMEM-resident index
        # vector per tile-block (constant over the chunk axis, so Pallas
        # DMAs it once); chunk j's rows live at offset j * t_blk * k in
        # (tile-in-block, slot) order, matching rows_ref
        idx = idx.reshape(ntp // t_blk, t_blk, n_chunks, k)
        idx = jnp.moveaxis(idx, 1, 2).reshape(
            ntp // t_blk, 1, n_chunks * t_blk * k)
        args = [idx, attrs]
        for x in (px, py, gc, gd, gt, rc, rd, tfin):
            xp, _ = _pad_tiles(x)
            args.append(xp)
        tile1p = pl.BlockSpec((t_blk, 1, p), _tile_map,
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntp // t_blk, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, n_chunks * t_blk * k),
                             lambda t, j, need: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((t_blk, k, ATTR_W), _attr_map,
                             memory_space=pltpu.VMEM),
                tile1p, tile1p,
                pl.BlockSpec((t_blk, 3, p), _tile_map,
                             memory_space=pltpu.VMEM),
                tile1p, tile1p, tile1p, tile1p, tile1p,
            ],
            out_specs=[
                pl.BlockSpec((n_pack, 128), lambda t, j, need: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((t_blk * k, 128), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
                pltpu.VMEM((t_blk, 1, p), jnp.float32),
            ],
        )
        packed = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, k=k, n_chunks=n_chunks,
                              unroll=unroll),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_pack, 128), jnp.float32),
            ],
            interpret=interpret,
        )(need, *args)[0]
        return packed.reshape(n_pack * 8, ATTR_W)[:n_out]

    def _derive(gidx, pix, conic, color, opacity, depth, prepacked,
                counts):
        """(attrs, need): from the binner's fused-attr table when given,
        else via the pack gather over gidx."""
        if prepacked is not None:
            return prepacked, _need_from_counts(counts)
        return (_pack_attrs(gidx, pix, conic, color, opacity, depth),
                _need_chunks(gidx))

    def _impl(gidx, px, py, pix, conic, color, opacity, depth,
              prepacked=None, counts=None):
        attrs, need = _derive(gidx, pix, conic, color, opacity, depth,
                              prepacked, counts)
        color_t, depth_t, t_t = _fwd_call(need, attrs, px[:, None],
                                          py[:, None])
        return (jnp.moveaxis(color_t, 1, 2), depth_t[:, 0], t_t[:, 0])

    @jax.custom_vjp
    def blend(gidx, px, py, pix, conic, color, opacity, depth, slots=None,
              prepacked=None, counts=None):
        del slots
        return _impl(gidx, px, py, pix, conic, color, opacity, depth,
                     prepacked, counts)

    def blend_fwd(gidx, px, py, pix, conic, color, opacity, depth,
                  slots=None, prepacked=None, counts=None):
        # Re-derives attrs/need exactly as _impl so XLA CSEs the pack
        # gather between primal and residual (one gather total) while the
        # backward reuses it from residuals instead of re-gathering
        # (measured ~10 ms/step at 100k pts/800px).
        attrs, need = _derive(gidx, pix, conic, color, opacity, depth,
                              prepacked, counts)
        color_t, depth_t, t_t = _fwd_call(need, attrs, px[:, None],
                                          py[:, None])
        out = (jnp.moveaxis(color_t, 1, 2), depth_t[:, 0], t_t[:, 0])
        return out, (gidx, px, py, attrs, need, pix, out, slots)

    def blend_bwd(res, cotangents):
        import os
        from fourdgs_tpu.ops.pallas.scatter import fits_vmem
        gidx, px, py, attrs, need, pix, out, slots = res
        n = pix.shape[0]
        c_final, d_final, t_final = out
        g_c, g_d, g_t = cotangents
        rc = (c_final * g_c).sum(-1)
        rd = d_final * g_d
        # Lane-packed fused reduction (see _bwd_fused_kernel): beats the
        # reassociation path 2x on the blend alone (7.1 vs 13.8 ms fwd+bwd
        # at 100k/800px). The first, unpacked (n+1, 16) accumulator variant
        # was a round-4 negative result — Mosaic lane-pads it 8x to 64 MiB
        # of scoped VMEM and the full step either OOMs or spills 47.7 ->
        # 115 ms; the 8-per-row lane packing keeps it at 8.4 MiB dense.
        # FOURDGS_PALLAS_NO_FUSED_BWD=1 falls back to reassociation.
        if (not interpret and gidx is not None
                and fits_vmem((n + 8) // 8, 128)
                and not os.environ.get("FOURDGS_PALLAS_NO_FUSED_BWD")):
            idx = jnp.where(gidx >= 0, gidx, n)
            acc = _bwd_call_fused(
                need, idx, attrs, px[:, None], py[:, None],
                jnp.moveaxis(g_c, 2, 1), g_d[:, None], g_t[:, None],
                rc[:, None], rd[:, None], t_final[:, None], n + 1)[:n]
            return (None, None, None, acc[:, 0:2], acc[:, 2:5],
                    acc[:, 5:8], acc[:, 8], acc[:, 9], None, None, None)
        grads = _bwd_call(
            need, attrs, px[:, None], py[:, None], jnp.moveaxis(g_c, 2, 1),
            g_d[:, None], g_t[:, None], rc[:, None], rd[:, None],
            t_final[:, None])
        g2 = grads.reshape(-1, ATTR_W)
        if (os.environ.get("FOURDGS_PALLAS_GRAD_SCATTER")
                and not interpret and gidx is not None):
            # EXPLORATION PATH, opt-in only: the serial Mosaic scatter-add
            # measures 5.8 ms ISOLATED at 960k x 16 rows (vs 7.8 ms for
            # the reassociated reduction) but IN-GRAPH it collapsed the
            # step 55.6 -> 134 ms (it forces materialization of the grads
            # buffer and serializes against the surrounding backward; see
            # PLAN.md negative results). Default stays on reassociation.
            from fourdgs_tpu.ops.pallas.scatter import scatter_add_rows
            flat = gidx.reshape(-1)
            flat_idx = jnp.where(flat >= 0, flat, n)
            acc = scatter_add_rows(flat_idx, g2, n_out=n + 1)[:n]
        elif slots is not None:
            # reassociated reduction over the binner's contiguous slot
            # runs (gather + cumsum) — see rasterize_tiled.BlendSlots
            from fourdgs_tpu.ops.rasterize_tiled import \
                reassociate_pair_grads
            acc = reassociate_pair_grads(g2, slots, n)
        else:
            # fallback (tile-sharded callers have no global slot space):
            # one packed row scatter-add (mirror of _pack_attrs)
            flat = gidx.reshape(-1)
            flat_idx = jnp.where(flat >= 0, flat, n)
            acc = jnp.zeros((n + 1, ATTR_W), jnp.float32).at[flat_idx].add(
                g2, mode="drop")[:n]
        return (None, None, None, acc[:, 0:2], acc[:, 2:5], acc[:, 5:8],
                acc[:, 8], acc[:, 9], None, None, None)

    blend.defvjp(blend_fwd, blend_bwd)
    return blend
