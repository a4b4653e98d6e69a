"""LPIPS v0.1 (Learned Perceptual Image Patch Similarity) in pure JAX.

Port of the reference's vendored lpipsPyTorch (behavioral contract at ref
lpipsPyTorch/modules/lpips.py:8-36, networks.py:12-96, utils.py:6-8):
z-score the inputs with the LPIPS shift/scale, run the VGG16 or AlexNet
conv feature stack, unit-normalize each target activation over channels,
take squared differences, apply the learned 1x1 "lin" weights, and average
over space; the score is the sum over feature levels.

Weights ship as a plain npz (no torch needed at eval time); create one from
torchvision + the richzhang weights with scripts/export_lpips_weights.py.
Search order for the npz: $FOURDGS_LPIPS_WEIGHTS, then
<repo>/weights/lpips_{net}.npz.

Convolutions are NCHW/OIHW exactly like torch so exported weights drop in
unchanged. All compute is jnp — jit/grad-compatible (usable as a training
loss, matching ref utils/loss_utils.py:17 lpips_loss).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# z-score buffers (ref networks.py:40-44)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (conv child indices of torchvision .features, tap-after child indices,
#  channel widths, conv params) per net
VGG_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG_TAPS = (3, 8, 15, 22, 29)        # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG_POOLS = (4, 9, 16, 23)           # maxpool positions reached before last tap
VGG_CHANNELS = (64, 128, 256, 512, 512)

ALEX_TAPS = (1, 4, 7, 9, 11)
ALEX_CHANNELS = (64, 192, 384, 256, 256)


def default_weights_path(net: str = "vgg") -> str:
    env = os.environ.get("FOURDGS_LPIPS_WEIGHTS")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, "weights", f"lpips_{net}.npz")


def load_weights(net: str = "vgg", path: str | None = None):
    """-> params dict or None when no weight file is available.

    If a `<path>.sha256` sidecar exists (written by
    scripts/export_lpips_weights.py), the file content is verified against
    it — a corrupted or swapped weight file fails loudly rather than
    silently skewing every reported LPIPS number."""
    path = path or default_weights_path(net)
    if not os.path.exists(path):
        return None
    side = path + ".sha256"
    if os.path.exists(side):
        import hashlib
        want = open(side).read().split()[0].strip()
        got = hashlib.sha256(open(path, "rb").read()).hexdigest()
        if got != want:
            raise ValueError(
                f"LPIPS weights checksum mismatch for {path}: "
                f"expected {want[:16]}..., got {got[:16]}... — re-export "
                f"with scripts/export_lpips_weights.py")
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _conv(x, w, b, stride=1, padding=1):
    # HIGHEST: a reported METRIC must not drift with the device's default
    # bf16 conv precision (same issue bit SSIM, see losses._depthwise_conv2d)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out + b[None, :, None, None]


def _maxpool(x, window=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, window, window),
        (1, 1, stride, stride), "VALID")


def _normalize(x, eps=1e-10):
    """Channel-unit-norm (ref utils.py:6-8)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


def _vgg_features(params, x):
    feats = []
    i = 0  # torchvision child index
    for ci, cin in enumerate(VGG_CONVS):
        if i in VGG_POOLS:
            x = _maxpool(x)
            i += 1
        x = _conv(x, params[f"conv{ci}/w"], params[f"conv{ci}/b"])
        i += 1
        x = jnp.maximum(x, 0.0)
        i += 1
        if i - 1 in VGG_TAPS:
            feats.append(_normalize(x))
    return feats


def _alex_features(params, x):
    feats = []
    x = _conv(x, params["conv0/w"], params["conv0/b"], stride=4, padding=2)
    x = jnp.maximum(x, 0.0)
    feats.append(_normalize(x))                       # after child 1
    x = _maxpool(x, 3, 2)
    x = _conv(x, params["conv1/w"], params["conv1/b"], padding=2)
    x = jnp.maximum(x, 0.0)
    feats.append(_normalize(x))                       # after child 4
    x = _maxpool(x, 3, 2)
    x = _conv(x, params["conv2/w"], params["conv2/b"])
    x = jnp.maximum(x, 0.0)
    feats.append(_normalize(x))                       # after child 7
    x = _conv(x, params["conv3/w"], params["conv3/b"])
    x = jnp.maximum(x, 0.0)
    feats.append(_normalize(x))                       # after child 9
    x = _conv(x, params["conv4/w"], params["conv4/b"])
    x = jnp.maximum(x, 0.0)
    feats.append(_normalize(x))                       # after child 11
    return feats


def lpips(params, x, y, net: str = "vgg"):
    """LPIPS distance per batch item.

    x, y: (B, H, W, 3) float images. The reference pipeline feeds [0, 1]
    images straight into the z-score (ref metrics.py:78-79 via
    lpipsPyTorch); pass the same range for parity. Returns (B,).
    """
    def prep(im):
        im = jnp.moveaxis(im, -1, 1)                  # NHWC -> NCHW
        return (im - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

    features = _vgg_features if net == "vgg" else _alex_features
    fx = features(params, prep(x))
    fy = features(params, prep(y))
    score = 0.0
    for lvl, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2                              # (B, C, H, W)
        w = params[f"lin{lvl}/w"]                     # (C,)
        score = score + jnp.einsum("bchw,c->b", d, w) / (d.shape[2] * d.shape[3])
    return score


@functools.lru_cache(maxsize=4)
def _jitted(net):
    return jax.jit(functools.partial(lpips, net=net))


def make_lpips_fn(net: str = "vgg", path: str | None = None):
    """-> callable(np images (H,W,3) [0,1]) -> float, or None if weights
    are absent. The metrics CLI uses this as its preferred backend."""
    params = load_weights(net, path)
    if params is None:
        return None
    fn = _jitted(net)

    def run(r, g):
        return float(fn(params, jnp.asarray(r)[None], jnp.asarray(g)[None])[0])
    return run
