"""K-nearest-neighbor mean squared distance, replacing the reference's
`simple_knn._C.distCUDA2` CUDA extension (call site: ref
scene/gaussian_model.py:148 — used once at init to size each Gaussian).

Contract: (N, 3) f32 points -> (N,) f32 mean of squared distances to the 3
nearest OTHER points. Implemented as chunked brute force: exact, O(N^2) but
runs once at startup; at the reference's <=40k init points this is a few
hundred MFLOPs of MXU-friendly matmul (dist2 = |a|^2 + |b|^2 - 2 a.b).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "chunk", "col_chunk"))
def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 2048,
                     col_chunk: int = 8192) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Two-level chunking: queries in `chunk` rows AND candidates in
    `col_chunk` columns, with a streaming (k+1)-smallest merge across
    column blocks. A single full-width distance block at 200k+ points is
    ~1.6 GB and its giant-trailing-axis top_k crashed the TPU worker;
    blocks here stay at chunk x col_chunk (64 MB) regardless of N."""
    n = points.shape[0]
    pad = (-n) % max(chunk, col_chunk)
    # Pad far away so padded rows are never selected as neighbors.
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e15)
    sq = (pts * pts).sum(-1)
    n_cols = pts.shape[0] // col_chunk
    c_pts = pts.reshape(n_cols, col_chunk, 3)
    c_sq = sq.reshape(n_cols, col_chunk)

    def body(carry, q):
        q_pts, q_sq = q

        def col(best, cb):
            cp, csq = cb
            # dist2[i, j] = |q_i|^2 + |p_j|^2 - 2 q_i . p_j  (MXU matmul)
            d2 = (q_sq[:, None] + csq[None, :]
                  - 2.0 * jnp.dot(q_pts, cp.T,
                                  preferred_element_type=jnp.float32))
            d2 = jnp.maximum(d2, 0.0)
            neg_top, _ = jax.lax.top_k(
                jnp.concatenate([-best, -d2], axis=1), k + 1)
            return -neg_top, None

        init = jnp.full((q_pts.shape[0], k + 1), jnp.inf)
        best, _ = jax.lax.scan(col, init, (c_pts, c_sq))
        # k+1 smallest includes the self-distance 0; drop it.
        return carry, best[:, 1:].mean(-1)

    q_pts = pts.reshape(-1, chunk, 3)
    q_sq = sq.reshape(-1, chunk)
    _, out = jax.lax.scan(body, None, (q_pts, q_sq))
    return out.reshape(-1)[:n]


def dist2_init(points: np.ndarray) -> jnp.ndarray:
    """distCUDA2-compatible entry: clamped mean 3-NN squared distance."""
    pts = jnp.asarray(np.asarray(points), jnp.float32)
    return jnp.maximum(knn_mean_sq_dist(pts, k=3), 1e-7)
