"""Tile-binned differentiable Gaussian rasterizer (XLA path).

TPU-native replacement for the reference's CUDA
`depth-diff-gaussian-rasterization` submodule (contract via its call sites,
ref gaussian_renderer/__init__.py:38-58,120-128). Architecture is designed
for XLA's static-shape compilation model, NOT a translation of the CUDA
kernels:

  1. project_gaussians           — vectorized EWA (ops/projection.py)
  2. bin_gaussians               — per-tile fixed-capacity index lists
     (num_tiles, TILE_CAP) in depth order. Default is the sort-free
     counting binner (coverage-mask prefix-counts; see
     bin_gaussians_count); a stable-sort binner is kept for
     cross-validation. All shapes static; overflow is counted, never
     crashes.
  3. blend (custom VJP)          — front-to-back alpha compositing over
     depth-ordered per-tile lists, vectorized over (tiles x chunk x pixels)
     with an in-chunk exclusive cumprod for order correctness. The backward
     pass re-runs the forward recurrence and uses the suffix identity
     dC/da_i = T_i c_i - (C_final - C_prefix_i)/(1 - a_i), so nothing
     per-step is stored (O(1) memory in list length).

Blending numerics follow the semantics spec in ops/rasterize_ref.py.
The same binning feeds the Pallas blend kernels (ops/pallas/blend.py).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.data.camera import Camera
from fourdgs_tpu.ops import sh as sh_ops
from fourdgs_tpu.ops.projection import Projected, project_gaussians
from fourdgs_tpu.ops.rasterize_ref import (ALPHA_MAX, ALPHA_MIN, T_MIN,
                                           RenderOutput)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; closed over by jit)."""
    img_width: int
    img_height: int
    tile_size: int = 16
    tile_cap: int = 1024       # max gaussians composited per tile
    pair_cap: int = 1 << 20    # (gaussian, tile) pair budget (sort binner)
    chunk: int = 32            # gaussians per compositing step
    backend: str = "auto"      # "auto" | "xla" | "pallas"
    binner: str = "count"      # "count" (sort-free) | "sort"
    bin_chunk: int = 4096      # gaussians per counting-binner scan step
    bin_pairs_per_chunk: int = 32768  # pair slots per scan step
    bin_rank_mode: str = "onehot"  # historical knob; the rank scan is
    #                                always slot-major one-hot now (MXU
    #                                tril matmuls when the block length is
    #                                a multiple of 256, elementwise cumsum
    #                                otherwise)
    # fused-attr binning (Pallas backend + count binner): the binner
    # scatters packed 16-lane attribute rows directly instead of gaussian
    # ids, eliminating the (num_tiles * tile_cap)-row pack gather.
    # MEASURED NEGATIVE on v5e (bench 10.4M -> 5.9M rays/s): XLA lowers
    # the 16-lane-wide row scatter far worse than the narrow id scatter
    # + wide gather it replaces. Kept available (and parity-tested) for
    # future XLA versions; default OFF.
    fuse_pack: bool = False

    @property
    def grid_x(self) -> int:
        return -(-self.img_width // self.tile_size)

    @property
    def grid_y(self) -> int:
        return -(-self.img_height // self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_size * self.tile_size


class BlendSlots(NamedTuple):
    """Binner slot metadata for the reassociated blend backward.

    The counting binner allocates each gaussian a CONTIGUOUS run of pair
    slots inside its chunk's budget, so per-gaussian gradient sums can be
    computed as prefix-sum differences over slot space (a gather + cumsum)
    instead of a (num_tiles * tile_cap)-row scatter-add — scatters run at
    ~62M rows/s on v5e, making them the backward's hot spot."""
    dest: jnp.ndarray     # (n_chunks, pc) int32 slot -> row in the
    #                       (num_tiles * tile_cap) table; OOB = dropped
    slot0: jnp.ndarray    # (Np,) global first slot per depth-ordered gaussian
    alloc: jnp.ndarray    # (Np,) number of slots allocated (budget-clamped)
    gid: jnp.ndarray      # (Np,) original gaussian index (>= n for padding)


class BinnedTiles(NamedTuple):
    gidx: jnp.ndarray            # (num_tiles, tile_cap) int32, -1 padded
    #                              (None in fused-attr mode)
    counts: jnp.ndarray          # (num_tiles,) int32
    num_pairs: jnp.ndarray       # () int32 total pairs before capping
    dropped_pairs: jnp.ndarray   # () int32 pairs beyond pair_cap
    dropped_tile: jnp.ndarray    # () int32 pairs beyond per-tile cap
    overflow: Any = None         # (num_tiles,) int32 per-tile cap excess
    slots: Any = None            # BlendSlots (count binner only)
    attrs: Any = None            # (num_tiles, tile_cap, W) packed attr rows
    #                              (fused-attr mode only; empty slots zero)


# ---------------------------------------------------------------------------
# Binning
# ---------------------------------------------------------------------------

def bin_gaussians(proj: Projected, cfg: RasterConfig,
                  num_tiles: int | None = None,
                  attr_table: jnp.ndarray | None = None) -> BinnedTiles:
    """Per-tile depth-ordered gaussian index lists, static shapes."""
    if cfg.binner == "count":
        return bin_gaussians_count(proj, cfg, num_tiles=num_tiles,
                                   attr_table=attr_table)
    assert num_tiles is None and attr_table is None, \
        "sort binner is global-only / index-emitting"
    return bin_gaussians_sort(proj, cfg)


def clip_proj_to_tile_rows(proj: Projected, row0, rows: int) -> Projected:
    """Restrict a projection's tile rects to `rows` tile rows starting at
    (traced) row `row0`, re-expressed in LOCAL row coordinates.

    This is the tile-axis sharding hook for the counting binner: each mesh
    rank clips to its own band of tile rows and bins only rows*grid_x
    tiles — same math, 1/n_tile the coverage-mask/scan/scatter rows —
    instead of binning all tiles redundantly on every rank."""
    y0 = jnp.clip(proj.rect_min[:, 1], row0, row0 + rows) - row0
    y1 = jnp.clip(proj.rect_max[:, 1], row0, row0 + rows) - row0
    span_x = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 0)
    touched = jnp.where(proj.tiles_touched > 0,
                        span_x * jnp.maximum(y1 - y0, 0), 0)
    rect_min = jnp.stack([proj.rect_min[:, 0], y0], axis=-1)
    rect_max = jnp.where((touched > 0)[:, None],
                         jnp.stack([proj.rect_max[:, 0], y1], axis=-1),
                         rect_min)
    return proj._replace(rect_min=rect_min, rect_max=rect_max,
                         tiles_touched=touched)


def _cumsum_1d(x: jnp.ndarray, blk: int = 256) -> jnp.ndarray:
    """Inclusive 1-D integer cumsum via blocked triangular matmuls.

    XLA's native 1-D cumsum lowers to log2(S) full-length elementwise
    passes — 2.9 ms for the 524k-slot `owner` integral at the bench point
    (scripts/exp_expand_r4.py). One level of (blk, blk) upper-triangular
    f32 matmul for in-block prefixes + a tiny native int32 cumsum over the
    S/blk block totals does the same work in ~0.1 ms. Exactness contract:
    per-BLOCK sums must stay < 2^24 (i.e. max element < 2^24/blk = 65536);
    holds for every binner input (marks <= bin_chunk, touched <= num_tiles).
    Block offsets accumulate in int32, so the TOTAL may reach 2^31."""
    s = x.shape[0]
    pad = (-s) % blk
    xp = jnp.pad(x, (0, pad)).astype(jnp.float32).reshape(-1, blk)
    triu = jnp.triu(jnp.ones((blk, blk), jnp.float32))
    incl = jax.lax.dot_general(xp, triu, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    incl = incl.astype(x.dtype)
    tot = incl[:, blk - 1]                          # (nb,) block totals
    boff = jnp.cumsum(tot) - tot                    # short native cumsum
    out = incl + boff[:, None]
    return out.reshape(-1)[:s]


def bin_gaussians_count(proj: Projected, cfg: RasterConfig,
                        num_tiles: int | None = None,
                        attr_table: jnp.ndarray | None = None
                        ) -> BinnedTiles:
    """Sort-free counting binner (the TPU-fast path).

    XLA's comparison sort over a static pair budget is O(P log^2 P) and
    dominated the step (432 ms of a 672 ms train step at 100k points).
    This binner exploits two structural facts instead:
      * a gaussian contributes AT MOST ONE entry per tile, and
      * tile coverage is an axis-aligned rect of tile columns/rows,
    so the stable in-tile rank of a pair is just a per-tile prefix count
    of a dense one-hot coverage mask — a matmul cumsum, no sort.

    Slot allocation is GLOBAL: depth-sorted gaussians take contiguous slot
    runs [start, start + touched) in one budget of
    `ceil(n / bin_chunk) * bin_pairs_per_chunk` slots (the knobs keep their
    product semantics so configs are unchanged). Per-tile slot order equals
    depth order, so the rank scan walks slot blocks with a carried per-tile
    counter. The r4 design clamped each bin_chunk of gaussians to its OWN
    pair budget; depth-ordered chunks are heavily skewed (near gaussians
    touch the most tiles), so the FRONT chunk overflowed its budget long
    before the global budget was exhausted (48k drops at the bench point
    with 10% of the global budget still free). Global allocation drops
    pairs only when the total exceeds the budget — drop-free operation
    needs a ~12% larger budget instead of a 2x per-chunk one.
    """
    n = proj.depth.shape[0]
    nt = cfg.num_tiles if num_tiles is None else num_tiles
    g = cfg.bin_chunk
    pc = cfg.bin_pairs_per_chunk
    # _cumsum_1d exactness contract (per-block sums < 2^24 at blk=256 ⇒
    # max element < 65536): touched_s elements are <= nt; marks are 0/1.
    # Static Python ints — violating configs must fail at trace time, not
    # silently corrupt prefix sums/ranks.
    assert nt < 65536, f"num_tiles {nt} >= 65536 breaks _cumsum_1d exactness"
    n_chunks = -(-n // g)
    pad = n_chunks * g - n
    n_pad = n_chunks * g
    total_slots = n_chunks * pc    # global pair budget
    sblk = pc                      # slots per rank-scan block

    visible = proj.tiles_touched > 0
    # stable=False: XLA's stable variant sorts (key, iota) lexicographically
    # and measures ~10x slower standalone (42 vs 4.4 ms at 131k on v5e).
    # Order among exact float-depth ties becomes unspecified — the
    # reference CUDA radix sort over the raw depth bits has arbitrary tie
    # order too, and blending ties commutes up to float association.
    order = jnp.argsort(jnp.where(visible, proj.depth, jnp.inf),
                        stable=False)
    # ONE packed per-gaussian gather into depth order (row-op cost is per
    # ROW on TPU; three separate rect/touched gathers measured ~0.7 ms
    # more than this single 7-col one). Columns:
    #   0 rect_min_x | 1 rect_min_y | 2 span_x | 3 touched
    #   4 qpix_x | 5 qpix_y | 6 cull_r2   (corner-cull data, see below)
    cull_r2 = (proj.cull_r2 if proj.cull_r2 is not None
               else jnp.full((n,), 1 << 30, jnp.int32))
    qpix = jnp.round(jnp.clip(proj.pix, -(1 << 20), 1 << 20)).astype(
        jnp.int32)
    ptbl = jnp.stack(
        [proj.rect_min[:, 0], proj.rect_min[:, 1],
         jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1),
         proj.tiles_touched, qpix[:, 0], qpix[:, 1], cull_r2], axis=1)
    ptbl_s = jnp.pad(ptbl[order], ((0, pad), (0, 0)))
    touched_s = ptbl_s[:, 3]
    order_p = jnp.pad(order, (0, pad), constant_values=n)

    # ---- pair expansion, HOISTED out of the rank scan (one set of big
    # vectorized ops instead of per-block small gathers; TPU gathers have
    # high fixed cost, so fewer+bigger wins) ----
    off = _cumsum_1d(touched_s)                            # inclusive, (Np,)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), off[:-1]])
    total = off[-1]
    g_slot0 = jnp.minimum(start, total_slots)
    # visible gaussians have strictly increasing starts, so marks are 0/1;
    # invisible ones (touched == 0) route to the dropped sentinel slot
    in_budget = (start < total_slots) & (touched_s > 0)
    marks = jnp.zeros((total_slots,), jnp.int32).at[
        jnp.where(in_budget, start, total_slots)].add(1, mode="drop")
    owner = _cumsum_1d(marks) - 1                          # (total_slots,)
    owner = jnp.clip(owner, 0, n_pad - 1)
    tbl = jnp.concatenate(
        [jnp.stack([g_slot0, order_p], axis=1), ptbl_s], axis=1)
    # columns: 0 g_slot0 | 1 gid | 2 rm_x | 3 rm_y | 4 span_x | 5 touched
    #          6 qpix_x | 7 qpix_y | 8 cull_r2
    row = tbl[owner]                                       # one row gather
    slots_g = jnp.arange(total_slots, dtype=jnp.int32)
    local = slots_g - row[:, 0]
    valid = (local >= 0) & (local < row[:, 5])
    sx = jnp.maximum(row[:, 4], 1)
    # local // sx via f32: int32 div has no TPU hardware path (lowered to
    # a multi-op emulation over every slot). (local + 0.5) / sx floors to
    # the exact quotient for 0 <= local < 2^22 and sx >= 1: the 0.5 bias
    # keeps the true value > q + 0.5/sx away from the integer boundary,
    # far beyond f32\'s 2^-23 relative rounding at these magnitudes.
    dy = jnp.floor((local.astype(jnp.float32) + 0.5)
                   / sx.astype(jnp.float32)).astype(jnp.int32)
    dx = local - dy * sx
    tx = row[:, 2] + dx
    ty = row[:, 3] + dy
    if num_tiles is None:
        # Corner cull (EXACT): a pair whose whole tile lies beyond the
        # gate radius (d^2 > cull_r2 implies alpha < ALPHA_MIN at every
        # pixel — ops/projection.py) contributes exactly zero, since the
        # blend's per-pixel gate would skip it anyway. Dropping it leaves
        # the image identical up to float association (removing entries
        # shifts chunk boundaries, regrouping the blend's tree-order
        # transmittance products — the same tolerance contract as the
        # chunked blend itself) while shrinking per-tile counts: fewer
        # live blend chunks, and tile_cap slots freed for real
        # contributors. It fires in the rect's AABB corner tiles (the
        # per-axis marginal bound already tightened the edges). The -1
        # absorbs qpix rounding (|round err| <= 0.5 per axis); distances
        # clamp to 23000 so the int32 squares cannot overflow and their
        # sum (2 * 23000^2 = 1.058e9) stays below the 2^30 = 1.074e9
        # no-cull sentinel. Skipped under tile-row-sharded binning
        # (num_tiles set): rect y is band-local there, so global pixel
        # coords aren't reconstructible.
        ts = cfg.tile_size
        lox, loy = tx * ts, ty * ts
        ddx = jnp.clip(jnp.maximum(lox - row[:, 6],
                                   row[:, 6] - (lox + ts - 1)) - 1,
                       0, 23000)
        ddy = jnp.clip(jnp.maximum(loy - row[:, 7],
                                   row[:, 7] - (loy + ts - 1)) - 1,
                       0, 23000)
        valid = valid & (ddx * ddx + ddy * ddy <= row[:, 8])
    t_ids_all = ty * cfg.grid_x + tx
    n_blocks = total_slots // sblk
    t_ids_all = jnp.where(valid, t_ids_all, 0).reshape(n_blocks, sblk)
    oidx_all = jnp.where(valid, row[:, 1], n).reshape(n_blocks, sblk)
    valid_all = valid.reshape(n_blocks, sblk)
    budget_dropped = jnp.maximum(total - total_slots, 0)

    # slot metadata for the reassociated blend backward (see BlendSlots):
    # each gaussian\'s slots are the contiguous global run
    # [slot0, slot0 + alloc)
    gs_alloc = jnp.clip(jnp.minimum(touched_s, total_slots - start), 0)

    # Rank scan: SLOT-major one-hot coverage M[s, t] = (t_ids[s] == t);
    # the rank of slot s is the inclusive prefix count at its OWN tile,
    # picked by a row-wise dot with M — no per-slot scalar gather (scalar
    # gathers run ~25x slower than row ops on v5e). The prefix count rides
    # blocked lower-triangular matmuls (bf16 in — exact, counts <= 256 fit
    # the 8-bit mantissa — f32 inter-block offsets): XLA\'s native cumsum
    # would run log2(sblk) elementwise passes over the full mask instead.
    # blk sweep (exp_rank_layout): 128 wins STANDALONE (2.94 vs 3.41 ms
    # at 256, 3.90 at 512 — matmul FLOPs scale with blk) but LOSES 0.5 ms
    # in the full bench step (15.88 vs 16.08M rays/s) — the same
    # isolated-vs-in-graph inversion as every other scan-shape probe
    # here; XLA fuses the 256 variant better. 256 stays.
    blk = 256
    matmul_rank = sblk % blk == 0
    t_iota = jnp.arange(nt, dtype=jnp.int32)[None, :]
    if matmul_rank:
        n_blk_s = sblk // blk
        tril = jnp.tril(jnp.ones((blk, blk), jnp.bfloat16))

    def body(counter, xs):
        t_ids, oidx_p, valid_c = xs
        m = valid_c[:, None] & (t_ids[:, None] == t_iota)   # (sblk, nt)
        if matmul_rank:
            mb = m.reshape(n_blk_s, blk, nt).astype(jnp.bfloat16)
            incl = jax.lax.dot_general(
                tril, mb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16)     # (blk, nbs, nt)
            incl = jnp.moveaxis(incl, 0, 1)              # (nbs, blk, nt)
            bsum = incl[:, blk - 1, :].astype(jnp.float32)
            boff = (jnp.cumsum(bsum, axis=0) - bsum      # exclusive
                    + counter[None, :].astype(jnp.float32))
            hist = (boff[-1] - counter + bsum[-1]).astype(jnp.int32)
            # row-pick via the one-hot: the in-block part rides bf16
            # (exact, one nonzero per row); the f32 block base comes from
            # a tiny per-block matvec against boff
            own_incl = (mb * incl).sum(-1)               # (nbs, blk) bf16
            own_base = jnp.einsum("bkt,bt->bk", mb.astype(jnp.float32),
                                  boff)
            rank = (own_incl.astype(jnp.float32) + own_base).astype(
                jnp.int32).reshape(sblk) - 1
        else:  # small/odd budgets (tiny tests): elementwise cumsum
            colcum = jnp.cumsum(m.astype(jnp.int32), axis=0)
            hist = colcum[-1]
            rank = (m * (colcum + counter[None, :])).sum(-1) - 1
        ok = valid_c & (rank < cfg.tile_cap) & (rank >= 0)
        dest = jnp.where(ok, t_ids * cfg.tile_cap + rank,
                         nt * cfg.tile_cap)
        # tile-cap overflow (valid & ~ok) is counted ONCE, by
        # dropped_tile\'s counter excess — not folded in here.
        # emit (dest, val); the scatter happens ONCE after the scan — one
        # big unique-index scatter beats n_blocks small ones
        return counter + hist, (dest, oidx_p)

    counter, (dest_all, val_all) = jax.lax.scan(
        body, jnp.zeros((nt,), jnp.int32),
        (t_ids_all, oidx_all, valid_all))
    # overflow dests are nt*tile_cap == out of bounds -> dropped (keeping
    # them out of the buffer also keeps the in-bounds indices truly unique).
    # dropped_pairs counts ONLY pair-budget drops; per-tile-cap drops are
    # counted separately by dropped_tile (they used to be double-counted in
    # both fields — ADVICE r4).
    n_drop = budget_dropped
    total_pairs = proj.tiles_touched.sum()
    gidx = None
    attrs = None
    if attr_table is None:
        mode = os.environ.get("FOURDGS_BIN_SCATTER", "xla")
        if mode == "pallas":
            # lane-packed serial scatter-set (see scatter_set_scalars).
            # MEASURED NEGATIVE on the full bench (15.1M vs 15.9M rays/s
            # for XLA\'s scatter): the serial kernel wins per-op but
            # breaks XLA\'s fusion of the scatter with the surrounding
            # binner ops. Kept opt-in, parity-tested.
            from fourdgs_tpu.ops.pallas.scatter import scatter_set_scalars
            gidx_flat = scatter_set_scalars(
                jnp.minimum(dest_all.reshape(-1), nt * cfg.tile_cap),
                val_all.reshape(-1), n_out=nt * cfg.tile_cap)
        else:
            gidx_flat = jnp.full((nt * cfg.tile_cap,), -1, jnp.int32).at[
                dest_all.reshape(-1)].set(val_all.reshape(-1), mode="drop",
                                          unique_indices=True)
        gidx = gidx_flat.reshape(nt, cfg.tile_cap)
    else:
        # fused-attr mode: scatter the PACKED ATTRIBUTE ROWS of each pair
        # into their (tile, rank) slot directly — the consumer (the Pallas
        # blend) then reads attrs straight from this table. This replaces
        # the narrow gidx scatter (active pairs) PLUS the downstream
        # (num_tiles * tile_cap)-row pack gather with one wide scatter
        # over only the ACTIVE pairs (row ops are per-row, not per-byte).
        # attr_table is (N+1, W) with a zero sentinel row at N, so padded
        # slots (val == n) scatter zeros == "no contribution".
        w = attr_table.shape[1]
        rows = attr_table[val_all.reshape(-1)]
        attrs = jnp.zeros((nt * cfg.tile_cap, w), attr_table.dtype).at[
            dest_all.reshape(-1)].set(rows, mode="drop",
                                      unique_indices=True)
        attrs = attrs.reshape(nt, cfg.tile_cap, w)
    overflow = jnp.maximum(counter - cfg.tile_cap, 0)
    return BinnedTiles(
        gidx=gidx,
        counts=jnp.minimum(counter, cfg.tile_cap),
        num_pairs=total_pairs,
        dropped_pairs=n_drop,
        dropped_tile=overflow.sum(),
        overflow=overflow,
        slots=BlendSlots(dest=dest_all, slot0=g_slot0, alloc=gs_alloc,
                         gid=order_p),
        attrs=attrs,
    )


def bin_gaussians_sort(proj: Projected, cfg: RasterConfig) -> BinnedTiles:
    """Sort-based binner (reference semantics; kept for cross-validation)."""
    n = proj.depth.shape[0]
    visible = proj.tiles_touched > 0

    # Depth order, invisible last.
    order = jnp.argsort(jnp.where(visible, proj.depth, jnp.inf))
    touched_s = proj.tiles_touched[order]
    rect_min_s = proj.rect_min[order]
    span_x_s = jnp.maximum(proj.rect_max[order, 0] - rect_min_s[:, 0], 1)

    # Exclusive cumsum offsets over depth-sorted gaussians.
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(touched_s, dtype=jnp.int32)])
    total = offsets[-1]

    # Each pair slot finds its owning gaussian (gather formulation of the
    # variable-length scatter the CUDA version does with duplication).
    slots = jnp.arange(cfg.pair_cap, dtype=jnp.int32)
    owner = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32) - 1
    owner = jnp.clip(owner, 0, n - 1)
    valid = slots < total
    local = slots - offsets[owner]
    sx = span_x_s[owner]
    dx = local % sx
    dy = local // sx
    tx = rect_min_s[owner, 0] + dx
    ty = rect_min_s[owner, 1] + dy
    tile_id = jnp.where(valid, ty * cfg.grid_x + tx, cfg.num_tiles)

    # Stable sort by tile id keeps depth order within each tile.
    pair_order = jnp.argsort(tile_id, stable=True)
    tile_sorted = tile_id[pair_order]
    gauss_sorted = order[owner[pair_order]]   # original gaussian indices

    tids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tids, side="right").astype(jnp.int32)
    full_counts = ends - starts
    counts = jnp.minimum(full_counts, cfg.tile_cap)

    slot_idx = starts[:, None] + jnp.arange(cfg.tile_cap, dtype=jnp.int32)[None, :]
    in_range = jnp.arange(cfg.tile_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    gidx = jnp.where(in_range,
                     gauss_sorted[jnp.clip(slot_idx, 0, cfg.pair_cap - 1)], -1)

    return BinnedTiles(
        gidx=gidx.astype(jnp.int32),
        counts=counts,
        num_pairs=total,
        dropped_pairs=jnp.maximum(total - cfg.pair_cap, 0),
        dropped_tile=jnp.maximum(full_counts - cfg.tile_cap, 0).sum(),
        overflow=jnp.maximum(full_counts - cfg.tile_cap, 0),
    )


# ---------------------------------------------------------------------------
# Blend: custom-VJP alpha compositing over per-tile lists
# ---------------------------------------------------------------------------

def _tile_pixel_coords(cfg: RasterConfig):
    """(num_tiles, P) pixel-center x and y coordinates."""
    t = cfg.tile_size
    ty, tx = np.divmod(np.arange(cfg.num_tiles), cfg.grid_x)
    oy, ox = np.divmod(np.arange(cfg.pixels_per_tile), t)
    px = tx[:, None] * t + ox[None, :]
    py = ty[:, None] * t + oy[None, :]
    return (jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32))


def _gather_chunks(gidx, attrs, cfg: RasterConfig, num_tiles: int | None = None):
    """Gather per-pair attributes, shaped (n_chunks, num_tiles, K, D).

    One contiguous row gather from a packed (N+1, 10) per-gaussian table
    (sentinel zero row for padded slots) instead of five separate gathers —
    the gather is the bandwidth hot spot of the blend wrapper."""
    nt = num_tiles if num_tiles is not None else cfg.num_tiles
    pix, conic, color, opacity, depth = attrs
    n = pix.shape[0]
    table = jnp.concatenate(
        [pix, conic, color, opacity[:, None], depth[:, None]], axis=1)
    table = jnp.concatenate([table, jnp.zeros((1, 10), table.dtype)], axis=0)
    idx = jnp.where(gidx >= 0, gidx, n)
    rows = table[idx]                                  # (nt, cap, 10)
    rows = jnp.moveaxis(rows.reshape(nt, -1, cfg.chunk, 10), 1, 0)
    return (rows[..., 0:2], rows[..., 2:5], rows[..., 5:8], rows[..., 8],
            rows[..., 9])


def _chunk_weights(c_pix, c_conic, c_op, px, py, t_in):
    """Per-chunk alpha/weight math shared by forward and backward.

    Shapes: c_* are (num_tiles, K, d); px/py (num_tiles, P); t_in
    (num_tiles, P). Returns (alpha_unclamped, alpha, use, w, t_out) with
    alpha/use/w of shape (num_tiles, K, P).
    """
    dx = c_pix[:, :, 0:1] - px[:, None, :]               # (nt, K, P)
    dy = c_pix[:, :, 1:2] - py[:, None, :]
    power = (-0.5 * (c_conic[:, :, 0:1] * dx * dx
                     + c_conic[:, :, 2:3] * dy * dy)
             - c_conic[:, :, 1:2] * dx * dy)
    # power > 0 is numerically possible for degenerate conics; skip (CUDA
    # `if (power > 0) continue;`).
    alpha_u = jnp.where(power > 0.0, 0.0,
                        c_op[:, :, None] * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.minimum(alpha_u, ALPHA_MAX)
    gated = alpha >= ALPHA_MIN
    g = jnp.where(gated, alpha, 0.0)
    cp = jnp.cumprod(1.0 - g, axis=1)
    t_pref = t_in[:, None, :] * jnp.concatenate(
        [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
    use = gated & (t_pref > T_MIN)
    au = jnp.where(use, alpha, 0.0)
    w = au * t_pref
    t_out = t_in * jnp.prod(1.0 - au, axis=1)
    return alpha_u, alpha, use, w, t_out, dx, dy


def _blend_fwd_scan(chunked, px, py, cfg: RasterConfig,
                    num_tiles: int | None = None):
    g_pix, g_conic, g_color, g_op, g_depth = chunked

    def body(carry, xs):
        color_acc, depth_acc, t = carry
        c_pix, c_conic, c_color, c_op, c_depth = xs
        _, _, _, w, t_out, _, _ = _chunk_weights(c_pix, c_conic, c_op, px, py, t)
        color_acc = color_acc + jnp.einsum(
            "tkp,tkc->tpc", w, c_color, preferred_element_type=jnp.float32)
        depth_acc = depth_acc + (w * c_depth[:, :, None]).sum(axis=1)
        return (color_acc, depth_acc, t_out), None

    nt = num_tiles if num_tiles is not None else cfg.num_tiles
    p = cfg.pixels_per_tile
    init = (jnp.zeros((nt, p, 3)), jnp.zeros((nt, p)), jnp.ones((nt, p)))
    (color, depth, t), _ = jax.lax.scan(
        body, init, (g_pix, g_conic, g_color, g_op, g_depth))
    return color, depth, t


def reassociate_pair_grads(packed: jnp.ndarray, slots: BlendSlots,
                           n: int) -> jnp.ndarray:
    """Per-gaussian sums of per-(tile, slot) gradient rows, WITHOUT a
    big scatter-add.

    `packed` is the (num_tiles * tile_cap, W) table of per-slot gradient
    rows. Each gaussian's slots form a contiguous run in the binner's
    GLOBAL slot space (BlendSlots), so: gather rows into slot order
    (dropped slots -> 0), blocked prefix-sum over the slot axis (in-block
    log-depth cumsum + f32 inter-block offsets, so runs may cross block
    boundaries), and difference the run boundaries. One 512k-row gather +
    cumsum + two 131k-row gathers replaces a ~1M-row scatter-add (measured
    7.8 ms vs 16 ms at the bench point). Float error stays
    ~log2(block) + n_blocks ULPs. Returns (n, W) per-gaussian gradient
    rows in original index order."""
    nblk, sblk = slots.dest.shape
    total_slots = nblk * sblk
    w = packed.shape[-1]
    gs = jnp.take(packed, slots.dest.reshape(-1), axis=0, mode="fill",
                  fill_value=0.0)
    # NOTE: lax.associative_scan measures faster ISOLATED (1.31 vs
    # 2.02 ms, exp_reassoc2) but regresses the full step in-graph
    # (11.50M -> 10.02M rays/s): its up/down-sweep materializes
    # intermediates that break XLA's fusion with the surrounding
    # backward. Plain cumsum stays.
    cs_in = jnp.cumsum(gs.reshape(nblk, sblk, w), axis=1)
    tot = cs_in[:, -1]                               # (nblk, w)
    boff = jnp.cumsum(tot, axis=0) - tot             # exclusive block base
    cs = (cs_in + boff[:, None, :]).reshape(total_slots, w)
    # csf[i] = sum of slot rows < i (global exclusive prefix)
    csf = jnp.concatenate([jnp.zeros((1, w), packed.dtype), cs], axis=0)
    seg = csf[slots.slot0 + slots.alloc] - csf[slots.slot0]
    idx = jnp.where(slots.gid < n, slots.gid, n + 1)
    return jnp.zeros((n + 1, w), packed.dtype).at[idx].set(
        seg, mode="drop", unique_indices=True)[:n]


@functools.lru_cache(maxsize=None)
def _make_blend(cfg: RasterConfig):
    """Build the custom-VJP blend function for a static config.

    `gidx`, `px`, `py` are index/coordinate inputs (no gradients); the
    blend works on ANY leading number of tiles, so callers may pass a
    tile-sharded slice (parallel/ shards the tile axis across chips).
    """

    def _impl(gidx, px, py, pix, conic, color, opacity, depth):
        chunked = _gather_chunks(gidx, (pix, conic, color, opacity, depth),
                                 cfg, num_tiles=gidx.shape[0])
        return _blend_fwd_scan(chunked, px, py, cfg, num_tiles=gidx.shape[0])

    @jax.custom_vjp
    def blend(gidx, px, py, pix, conic, color, opacity, depth, slots=None,
              prepacked=None, counts=None):
        del slots, prepacked, counts  # fused-attr mode is Pallas-only
        return _impl(gidx, px, py, pix, conic, color, opacity, depth)

    def blend_fwd(gidx, px, py, pix, conic, color, opacity, depth,
                  slots=None, prepacked=None, counts=None):
        del prepacked, counts
        out = _impl(gidx, px, py, pix, conic, color, opacity, depth)
        return out, (gidx, px, py, pix, conic, color, opacity, depth, out,
                     slots)

    def blend_bwd(res, cotangents):
        (gidx, px, py, pix, conic, color, opacity, depth, out,
         slots) = res
        nt = gidx.shape[0]
        c_final, d_final, t_final = out
        g_color_out, g_depth_out, g_t_out = cotangents
        chunked = _gather_chunks(gidx, (pix, conic, color, opacity, depth),
                                 cfg, num_tiles=nt)

        # Project colors onto the incoming cotangent ONCE per (slot, pixel):
        # the suffix identity only ever needs c . g_c and z * g_d, so the
        # backward runs entirely on (nt, K, P) scalars — no (nt, K, P, 3)
        # intermediates (3x memory/bandwidth saving on the hot path).
        r_c = (c_final * g_color_out).sum(-1)     # (nt, P)
        r_d = d_final * g_depth_out

        def body(carry, xs):
            cg_acc, dg_acc, t = carry
            c_pix, c_conic, c_color, c_op, c_depth, c_gidx = xs
            alpha_u, alpha, use, w, t_out, dx, dy = _chunk_weights(
                c_pix, c_conic, c_op, px, py, t)
            # c . g_c as three broadcast FMAs (a 3-deep einsum contraction
            # would waste the MXU; this is pure VPU)
            cg = (c_color[:, :, 0:1] * g_color_out[:, None, :, 0]
                  + c_color[:, :, 1:2] * g_color_out[:, None, :, 1]
                  + c_color[:, :, 2:3] * g_color_out[:, None, :, 2])
            dg = c_depth[:, :, None] * g_depth_out[:, None, :]
            after_cg = cg_acc[:, None] + jnp.cumsum(w * cg, axis=1)
            after_dg = dg_acc[:, None] + jnp.cumsum(w * dg, axis=1)
            # dL/dcolor_k, dL/ddepth_k (pure weights)
            d_c = jnp.einsum("tkp,tpc->tkc", w, g_color_out,
                             preferred_element_type=jnp.float32)
            d_z = (w * g_depth_out[:, None, :]).sum(-1)
            # dL/dalpha via the suffix identity (straight-through on clamp).
            one_m_a = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
            t_pref = jnp.where(alpha > 0, w / jnp.maximum(alpha, 1e-20), 0.0)
            da = (t_pref * (cg + dg)
                  - (r_c[:, None] - after_cg + r_d[:, None] - after_dg
                     + g_t_out[:, None] * t_final[:, None]) / one_m_a)
            da = jnp.where(use, da, 0.0)
            # Chain to opacity / power.
            d_op = (da * jnp.where(c_op[:, :, None] > 0,
                                   alpha_u / jnp.maximum(c_op[:, :, None], 1e-20),
                                   0.0)).sum(-1)
            d_pow = da * alpha_u
            # power partials
            d_A = (-0.5 * d_pow * dx * dx).sum(-1)
            d_B = (-d_pow * dx * dy).sum(-1)
            d_C = (-0.5 * d_pow * dy * dy).sum(-1)
            d_px = (d_pow * -(c_conic[:, :, 0:1] * dx
                              + c_conic[:, :, 1:2] * dy)).sum(-1)
            d_py = (d_pow * -(c_conic[:, :, 2:3] * dy
                              + c_conic[:, :, 1:2] * dx)).sum(-1)
            grads = (jnp.stack([d_px, d_py], -1),
                     jnp.stack([d_A, d_B, d_C], -1),
                     d_c, d_op, d_z, c_gidx)
            return (after_cg[:, -1], after_dg[:, -1], t_out), grads

        p = cfg.pixels_per_tile
        init = (jnp.zeros((nt, p)), jnp.zeros((nt, p)), jnp.ones((nt, p)))
        gidx_chunked = jnp.moveaxis(
            gidx.reshape(nt, -1, cfg.chunk), 1, 0)
        _, grads = jax.lax.scan(body, init, chunked + (gidx_chunked,))
        gp, gc, gcol, gop, gz, gidx_c = grads

        # Reduce per-(tile, slot) grads back to per-gaussian rows. Packed
        # 10-wide rows either way (separate per-attribute reductions are
        # the bandwidth hot spot); with binner slot metadata the reduction
        # is reassociated over contiguous slot runs (gather + cumsum),
        # otherwise one scatter-add. Padded slots have gidx == -1, which
        # would WRAP in jnp indexing — remap to n so mode="drop" discards.
        n = pix.shape[0]

        def rows(g, d):
            g = g if d else g[..., None]
            return jnp.moveaxis(g, 0, 1).reshape(nt * cfg.tile_cap, -1)

        packed = jnp.concatenate(
            [rows(gp, 2), rows(gc, 3), rows(gcol, 3), rows(gop, 0),
             rows(gz, 0)], axis=1)
        if slots is not None:
            acc = reassociate_pair_grads(packed, slots, n)
        else:
            flat = jnp.moveaxis(gidx_c, 0, 1).reshape(-1)
            flat_idx = jnp.where(flat >= 0, flat, n)
            acc = jnp.zeros((n + 1, 10), jnp.float32).at[flat_idx].add(
                packed, mode="drop")[:n]
        return (None, None, None, acc[:, 0:2], acc[:, 2:5], acc[:, 5:8],
                acc[:, 8], acc[:, 9], None, None, None)

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def _untile(x: jnp.ndarray, cfg: RasterConfig):
    """(num_tiles, P, ...) -> (H, W, ...) crop."""
    t = cfg.tile_size
    ch = x.shape[2:]
    x = x.reshape((cfg.grid_y, cfg.grid_x, t, t) + ch)
    x = jnp.moveaxis(x, 2, 1)  # (gy, t, gx, t, ...)
    x = x.reshape((cfg.grid_y * t, cfg.grid_x * t) + ch)
    return x[: cfg.img_height, : cfg.img_width]


def tile_image(img: jnp.ndarray, cfg: RasterConfig) -> jnp.ndarray:
    """(H, W, ...) -> (num_tiles, P, ...): inverse of _untile (pads with
    zeros when H/W are not tile multiples). Used to shard ground-truth
    images along the tile axis for per-tile losses."""
    t = cfg.tile_size
    ch = img.shape[2:]
    pad_h = cfg.grid_y * t - img.shape[0]
    pad_w = cfg.grid_x * t - img.shape[1]
    img = jnp.pad(img, [(0, pad_h), (0, pad_w)] + [(0, 0)] * len(ch))
    img = img.reshape((cfg.grid_y, t, cfg.grid_x, t) + ch)
    img = jnp.moveaxis(img, 1, 2)
    return img.reshape((cfg.num_tiles, t * t) + ch)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,     # (N,) activated
    colors: jnp.ndarray,        # (N, 3) precomputed RGB (see render for SH)
    camera: Camera,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    ndc_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    scale_modifier: float = 1.0,
    cov3d_precomp: jnp.ndarray | None = None,
) -> RenderOutput:
    """Differentiable render of one camera. Matches the oracle
    (rasterize_reference) up to float-accumulation order."""
    proj = project_gaussians(
        means3d, scales, quats, camera, cfg.img_width, cfg.img_height,
        cfg.tile_size, ndc_offset=ndc_offset, alive=alive,
        scale_modifier=scale_modifier, cov3d_precomp=cov3d_precomp,
        opacities=opacities)

    backend = cfg.backend
    if backend == "auto":
        # Pallas kernels win on TPU (fwd 17ms vs 25ms XLA at 100k/800px);
        # on CPU they would run interpreted, so use the XLA path there.
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    attr_table = None
    if backend == "pallas" and cfg.binner == "count" and cfg.fuse_pack:
        from fourdgs_tpu.ops.pallas.blend import pack_attr_table
        attr_table = jax.lax.stop_gradient(pack_attr_table(
            proj.pix, proj.conic, colors, opacities, proj.depth))
    binned = jax.tree.map(
        jax.lax.stop_gradient,
        bin_gaussians(jax.tree.map(jax.lax.stop_gradient, proj), cfg,
                      attr_table=attr_table))

    if backend == "pallas":
        from fourdgs_tpu.ops.pallas import blend as pallas_blend
        blend_fn = pallas_blend.make_blend(cfg)
    else:
        blend_fn = _make_blend(cfg)
    px, py = _tile_pixel_coords(cfg)
    color_t, depth_t, t_t = blend_fn(
        binned.gidx, px, py, proj.pix, proj.conic, colors, opacities,
        proj.depth, binned.slots, binned.attrs, binned.counts)

    color = _untile(color_t, cfg) + _untile(t_t, cfg)[..., None] * bg
    depth = _untile(depth_t, cfg)
    alpha = 1.0 - _untile(t_t, cfg)
    # EFFECTIVE tile-cap drops: per-tile excess counts only where some
    # pixel is still unsaturated (final transmittance above the blend's
    # T_MIN gate). Ranks follow depth order, so dropped pairs sit BEHIND
    # every composited one — in a fully saturated tile they could not have
    # contributed, exactly the reference CUDA forward's per-pixel early
    # termination (T < 1e-4). Raw excess stays observable via
    # BinnedTiles.overflow.
    if binned.overflow is not None:
        unsat = (jax.lax.stop_gradient(t_t) > T_MIN).any(axis=1)
        dropped_tile = (binned.overflow * unsat).sum()
        tile_peak = (binned.counts + binned.overflow).max()
    else:
        dropped_tile = binned.dropped_tile
        tile_peak = binned.counts.max()
    return RenderOutput(color=color, depth=depth, alpha=alpha,
                        radii=proj.radius, visibility=proj.radius > 0,
                        dropped_pairs=binned.dropped_pairs,
                        dropped_tile=dropped_tile,
                        num_pairs=binned.num_pairs,
                        tile_peak=tile_peak)
