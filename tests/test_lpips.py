"""LPIPS-in-JAX vs a torch reference replica built with the SAME random
weights — validates conv stack wiring, taps, normalization and the lin
aggregation (ref lpipsPyTorch/modules/{lpips,networks,utils}.py). Real
pretrained weights then drop in via scripts/export_lpips_weights.py with
no further code paths to trust."""
import numpy as np
import pytest

from fourdgs_tpu.ops import lpips as jlpips

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

VGG_CFG = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
           (128, 256), (256, 256), (256, 256), "M",
           (256, 512), (512, 512), (512, 512), "M",
           (512, 512), (512, 512), (512, 512), "M"]


def build_torch_vgg_features():
    layers = []
    for item in VGG_CFG:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            cin, cout = item
            layers.append(nn.Conv2d(cin, cout, 3, padding=1))
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def build_torch_alex_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(3, 2))


def torch_lpips(net, taps, lins, x):
    """Reference forward (ref networks.py:55-66 + lpips.py:31-36)."""
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    x = (x - mean) / std
    feats = []
    for i, layer in enumerate(net, 1):
        x = layer(x)
        if i in taps:
            n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
            feats.append(x / (n + 1e-10))
    return feats


def random_params(rng, net):
    if net == "vgg":
        convs = [c for c in VGG_CFG if c != "M"]
        channels = jlpips.VGG_CHANNELS
        ksizes = [3] * len(convs)
    else:
        convs = [(3, 64), (64, 192), (192, 384), (384, 256), (256, 256)]
        channels = jlpips.ALEX_CHANNELS
        ksizes = [11, 5, 3, 3, 3]
    params = {}
    for i, ((cin, cout), k) in enumerate(zip(convs, ksizes)):
        params[f"conv{i}/w"] = (rng.normal(size=(cout, cin, k, k))
                                * 0.05).astype(np.float32)
        params[f"conv{i}/b"] = rng.normal(size=(cout,)).astype(np.float32) * 0.1
    for lvl, c in enumerate(channels):
        params[f"lin{lvl}/w"] = rng.uniform(0, 1, (c,)).astype(np.float32)
    return params


@pytest.mark.parametrize("net", ["vgg", "alex"])
def test_lpips_matches_torch_replica(net):
    rng = np.random.default_rng(0)
    params = random_params(rng, net)
    size = 64 if net == "vgg" else 96   # alex needs >= ~64 after stride-4
    x = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)

    ours = float(jlpips.lpips(params, x, y, net=net)[0])

    tnet = (build_torch_vgg_features() if net == "vgg"
            else build_torch_alex_features())
    convs = [m for m in tnet if isinstance(m, nn.Conv2d)]
    with torch.no_grad():
        for i, m in enumerate(convs):
            m.weight.copy_(torch.from_numpy(params[f"conv{i}/w"]))
            m.bias.copy_(torch.from_numpy(params[f"conv{i}/b"]))
        taps = ([i + 1 for i in jlpips.VGG_TAPS] if net == "vgg"
                else [i + 1 for i in jlpips.ALEX_TAPS])
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
        fx = torch_lpips(tnet, taps, None, tx)
        fy = torch_lpips(tnet, taps, None, ty)
        ref = 0.0
        for lvl, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            w = torch.from_numpy(params[f"lin{lvl}/w"])
            ref += float((d * w[None, :, None, None]).sum(1).mean((1, 2)))
    assert ours == pytest.approx(ref, rel=2e-3)


def test_make_lpips_fn_absent_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("FOURDGS_LPIPS_WEIGHTS",
                       str(tmp_path / "missing.npz"))
    assert jlpips.make_lpips_fn("vgg") is None


def test_make_lpips_fn_with_weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    params = random_params(rng, "alex")
    p = tmp_path / "lpips_alex.npz"
    np.savez(p, **params)
    monkeypatch.setenv("FOURDGS_LPIPS_WEIGHTS", str(p))
    fn = jlpips.make_lpips_fn("alex")
    r = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    out = fn(r, r)
    assert out == pytest.approx(0.0, abs=1e-6)
