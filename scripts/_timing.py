"""Shared honest-timing harness for the profile/experiment scripts.

On the axon-tunneled TPU backend `jax.block_until_ready` does not reliably
block (sub-ms results for 100ms programs when the warmup itself never
synced). The reliable pattern: force completion by pulling a DEPENDENT
scalar to the host, both after warmup and after the timed loop; the device
stream is sequential, so one final sync covers all enqueued iterations.
"""
import time

import jax
import jax.numpy as jnp


def tsum(x):
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.number)]
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)


def sync(x):
    return float(tsum(x))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)                       # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms")
    return dt
