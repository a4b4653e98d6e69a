"""The sort-free counting binner must produce exactly the same per-tile
lists as the sort-based reference binner."""
import jax.numpy as jnp
import numpy as np
import pytest

from fourdgs_tpu.ops.projection import project_gaussians
from fourdgs_tpu.ops.rasterize_tiled import (RasterConfig,
                                             bin_gaussians_count,
                                             bin_gaussians_sort)
from tests.test_rasterize import H, W, random_scene, simple_camera


@pytest.mark.parametrize("n,bin_chunk,pc", [(64, 16, 512), (300, 64, 1024),
                                            (64, 64, 2048)])
def test_count_binner_matches_sort_binner(n, bin_chunk, pc):
    rng = np.random.default_rng(7)
    means, scales, quats, opac, colors = random_scene(rng, n=n)
    cam = simple_camera()
    cfg = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=256,
                       pair_cap=1 << 14, chunk=8, bin_chunk=bin_chunk,
                       bin_pairs_per_chunk=pc)
    proj = project_gaussians(means, scales, quats, cam, W, H, 16)
    a = bin_gaussians_sort(proj, cfg)
    b = bin_gaussians_count(proj, cfg)
    assert int(a.dropped_pairs) == 0
    assert int(b.dropped_pairs) == 0
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.gidx), np.asarray(b.gidx))
    assert int(a.num_pairs) == int(b.num_pairs)


def test_count_binner_tile_cap_keeps_nearest():
    rng = np.random.default_rng(3)
    means, scales, quats, opac, colors = random_scene(rng, n=200)
    cam = simple_camera()
    big = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=256,
                       pair_cap=1 << 14)
    small = RasterConfig(img_width=W, img_height=H, tile_size=16, tile_cap=4,
                         pair_cap=1 << 14)
    proj = project_gaussians(means, scales, quats, cam, W, H, 16)
    full = bin_gaussians_count(proj, big)
    capped = bin_gaussians_count(proj, small)
    # capped lists are the PREFIX (nearest in depth) of the full lists
    np.testing.assert_array_equal(np.asarray(capped.gidx),
                                  np.asarray(full.gidx)[:, :4])
    assert int(capped.dropped_tile) > 0
