#!/usr/bin/env python
"""Export LPIPS v0.1 weights (torchvision backbone + richzhang lin layers)
to the plain-npz format consumed by fourdgs_tpu.ops.lpips.

Run this ONCE in any environment that has torchvision (and network access
for the torch hub downloads); the resulting npz is portable and the eval
pipeline never needs torch again:

  python scripts/export_lpips_weights.py --net vgg --out weights/lpips_vgg.npz

Key layout: conv{i}/w (OIHW), conv{i}/b, lin{k}/w ((C,) squeezed 1x1 conv),
matching ref lpipsPyTorch/modules/networks.py:12-96.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def export(net: str, out: str):
    import torch
    from torchvision import models

    if net == "vgg":
        backbone = models.vgg16(
            weights=models.VGG16_Weights.IMAGENET1K_V1).features
        conv_children = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        n_channels = [64, 128, 256, 512, 512]
    elif net == "alex":
        backbone = models.alexnet(
            weights=models.AlexNet_Weights.IMAGENET1K_V1).features
        conv_children = [0, 3, 6, 8, 10]
        n_channels = [64, 192, 384, 256, 256]
    else:
        raise SystemExit(f"unsupported net {net}")

    arrays = {}
    for i, child in enumerate(conv_children):
        layer = backbone[child]
        arrays[f"conv{i}/w"] = layer.weight.detach().numpy()
        arrays[f"conv{i}/b"] = layer.bias.detach().numpy()

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           f"master/lpips/weights/v0.1/{net}.pth")
    state = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    # keys like 'lin0.model.1.weight' with shape (1, C, 1, 1)
    for k, v in state.items():
        lvl = int("".join(c for c in k.split(".")[0] if c.isdigit()))
        arrays[f"lin{lvl}/w"] = v.detach().numpy().reshape(-1)
    assert len([k for k in arrays if k.startswith("lin")]) == len(n_channels)

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez(out, **arrays)
    # checksum sidecar: fourdgs_tpu.ops.lpips.load_weights verifies it so a
    # corrupted/mismatched copy fails loudly instead of skewing metrics
    import hashlib
    digest = hashlib.sha256(open(out, "rb").read()).hexdigest()
    with open(out + ".sha256", "w") as f:
        f.write(f"{digest}  {os.path.basename(out)}\n")
    print(f"wrote {out}: {len(arrays)} arrays (sha256 {digest[:16]}...)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="vgg", choices=["vgg", "alex"])
    p.add_argument("--out", default=None)
    a = p.parse_args()
    export(a.net, a.out or f"weights/lpips_{a.net}.npz")
