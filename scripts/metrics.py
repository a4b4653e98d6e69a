#!/usr/bin/env python
"""Metrics CLI: PSNR / SSIM / MS-SSIM / D-SSIM (+ LPIPS when a torch lpips
stack is importable) over renders/gt dirs; writes results.json +
per_view.json (mirrors ref metrics.py:36-123)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def read_images(renders_dir, gt_dir):
    from PIL import Image
    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for name in names:
        r = np.asarray(Image.open(os.path.join(renders_dir, name)),
                       np.float32)[..., :3] / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, name)),
                       np.float32)[..., :3] / 255.0
        renders.append(r)
        gts.append(g)
    return renders, gts, names


def try_lpips():
    """Preferred backend: the pure-JAX LPIPS with npz weights (no torch
    needed, see fourdgs_tpu/ops/lpips.py); falls back to an importable
    torch lpips package; None when neither is available."""
    from fourdgs_tpu.ops import lpips as jlpips
    nets = {k: jlpips.make_lpips_fn(k) for k in ("vgg", "alex")}
    nets = {k: v for k, v in nets.items() if v is not None}
    if nets:
        def fn(r, g):
            return {f"lpips-{k}": net(r, g) for k, net in nets.items()}
        return fn
    try:
        import lpips  # noqa: F401
        import torch
        tnets = {"vgg": lpips.LPIPS(net="vgg"), "alex": lpips.LPIPS(net="alex")}

        def fn(r, g):
            out = {}
            tr = torch.from_numpy(r.transpose(2, 0, 1))[None] * 2 - 1
            tg = torch.from_numpy(g.transpose(2, 0, 1))[None] * 2 - 1
            for k, net in tnets.items():
                out[f"lpips-{k}"] = float(net(tr, tg).item())
            return out
        return fn
    except Exception:
        return None


def evaluate(model_paths):
    import jax.numpy as jnp

    from fourdgs_tpu.ops import losses

    lpips_fn = try_lpips()
    if lpips_fn is None:
        from fourdgs_tpu.ops import lpips as jlpips
        print(
            "LPIPS: skipped — missing weight files:\n"
            + "".join(f"  {jlpips.default_weights_path(k)}\n"
                      for k in ("vgg", "alex"))
            + "  To produce them, run ONCE on any machine with torchvision\n"
            "  + network access (this image has neither):\n"
            "    python scripts/export_lpips_weights.py --net alex "
            "--out weights/lpips_alex.npz\n"
            "    python scripts/export_lpips_weights.py --net vgg "
            "--out weights/lpips_vgg.npz\n"
            "  then copy the npz (+ .sha256 sidecar) into <repo>/weights/.\n"
            "  All other metrics are still computed.")

    for scene_dir in model_paths:
        print(f"Scene: {scene_dir}")
        full, per_view = {}, {}
        test_dir = os.path.join(scene_dir, "test")
        for method in sorted(os.listdir(test_dir)):
            print(f"  Method: {method}")
            mdir = os.path.join(test_dir, method)
            renders, gts, names = read_images(os.path.join(mdir, "renders"),
                                              os.path.join(mdir, "gt"))
            rows = []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r)[None], jnp.asarray(g)[None]
                row = {
                    "PSNR": float(losses.psnr(rj, gj)[0]),
                    "SSIM": float(losses.ssim(rj, gj)),
                    "MS-SSIM": float(losses.ms_ssim(rj, gj)[0]),
                }
                row["D-SSIM"] = (1 - row["MS-SSIM"]) / 2
                if lpips_fn:
                    row.update(lpips_fn(r, g))
                rows.append(row)
            keys = rows[0].keys()
            agg = {k: float(np.mean([r[k] for r in rows])) for k in keys}
            for k, v in agg.items():
                print(f"    {k:8s}: {v:.7f}")
            full[method] = agg
            per_view[method] = {
                k: {name: r[k] for name, r in zip(names, rows)} for k in keys}
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = parser.parse_args()
    evaluate(args.model_paths)
