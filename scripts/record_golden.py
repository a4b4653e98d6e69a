#!/usr/bin/env python
"""(Re)record the golden PSNR trajectory for tests/test_golden.py.

Run on the CI platform (CPU backend — the same pinning tests/conftest.py
applies) after any INTENDED numeric change, and commit the updated json:

    python scripts/record_golden.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    # build the same fixture data the test module uses
    from tests import test_e2e_train as t
    from tests.test_golden import GOLDEN_PATH, run_trajectory
    import numpy as np
    import jax.numpy as jnp
    from fourdgs_tpu.ops.rasterize_tiled import RasterConfig, rasterize

    rng = np.random.default_rng(5)
    cams = t.look_at_cameras(10)
    means, scales, quats, opac, colors = t.true_scene(rng)
    rcfg = RasterConfig(img_width=t.W, img_height=t.H, tile_size=16,
                        tile_cap=256, pair_cap=1 << 15, chunk=8)
    bg = jnp.zeros(3)
    images = jax.vmap(lambda cam: rasterize(
        means, scales, quats, opac, colors, cam, bg, rcfg).color)(cams)
    data = (cams, images, np.asarray(means), np.asarray(colors))

    traj = run_trajectory(data)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(traj, f, indent=1)
    print(f"wrote {GOLDEN_PATH}:")
    print(json.dumps(traj, indent=1))


if __name__ == "__main__":
    main()
