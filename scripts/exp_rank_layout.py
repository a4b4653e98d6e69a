#!/usr/bin/env python
"""Rank-scan layout A/B: slot-axis-MIDDLE (current, needs two moveaxis
relayouts around the tril matmul) vs slot-axis-LAST (mask built directly
as (nbs, nt, blk), matmul contracts the lane axis, no relayouts).
Shapes = bench point: nt=625, sblk=16384, n_blocks=32."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts._timing import timeit


def main():
    from fourdgs_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    nt, sblk, n_blocks, cap = 625, 16384, 32, 512
    blk = int(os.environ.get("RANK_BLK", 256))
    n_blk_s = sblk // blk
    key = jax.random.key(0)
    t_ids_all = jax.random.randint(key, (n_blocks, sblk), 0, nt)
    valid_all = jax.random.uniform(key, (n_blocks, sblk)) < 0.9
    oidx_all = jax.random.randint(key, (n_blocks, sblk), 0, 131072)
    t_iota = jnp.arange(nt, dtype=jnp.int32)[None, :]
    tril = jnp.tril(jnp.ones((blk, blk), jnp.bfloat16))
    triu = jnp.triu(jnp.ones((blk, blk), jnp.bfloat16))

    def body_mid(counter, xs):
        t_ids, oidx_p, valid_c = xs
        m = valid_c[:, None] & (t_ids[:, None] == t_iota)
        mb = m.reshape(n_blk_s, blk, nt).astype(jnp.bfloat16)
        incl = jax.lax.dot_general(
            tril, mb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        incl = jnp.moveaxis(incl, 0, 1)
        bsum = incl[:, blk - 1, :].astype(jnp.float32)
        boff = (jnp.cumsum(bsum, axis=0) - bsum
                + counter[None, :].astype(jnp.float32))
        hist = (boff[-1] - counter + bsum[-1]).astype(jnp.int32)
        own_incl = (mb * incl).sum(-1)
        own_base = jnp.einsum("bkt,bt->bk", mb.astype(jnp.float32), boff)
        rank = (own_incl.astype(jnp.float32) + own_base).astype(
            jnp.int32).reshape(sblk) - 1
        ok = valid_c & (rank < cap) & (rank >= 0)
        dest = jnp.where(ok, t_ids * cap + rank, nt * cap)
        return counter + hist, (dest, oidx_p)

    def body_last(counter, xs):
        t_ids, oidx_p, valid_c = xs
        t2 = t_ids.reshape(n_blk_s, 1, blk)
        v2 = valid_c.reshape(n_blk_s, 1, blk)
        m2 = (v2 & (t2 == t_iota.reshape(1, nt, 1))).astype(jnp.bfloat16)
        incl = jax.lax.dot_general(
            m2, triu, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)        # (nbs, nt, blk)
        bsum = incl[:, :, blk - 1].astype(jnp.float32)  # (nbs, nt)
        boff = (jnp.cumsum(bsum, axis=0) - bsum
                + counter[None, :].astype(jnp.float32))
        hist = (boff[-1] - counter + bsum[-1]).astype(jnp.int32)
        own_incl = (m2 * incl).sum(1)                   # (nbs, blk)
        own_base = jnp.einsum("ntk,nt->nk", m2.astype(jnp.float32), boff)
        rank = (own_incl.astype(jnp.float32) + own_base).astype(
            jnp.int32).reshape(sblk) - 1
        ok = valid_c & (rank < cap) & (rank >= 0)
        dest = jnp.where(ok, t_ids * cap + rank, nt * cap)
        return counter + hist, (dest, oidx_p)

    def mk(body):
        @jax.jit
        def run(t_ids_all, oidx_all, valid_all):
            counter, (dest, val) = jax.lax.scan(
                body, jnp.zeros((nt,), jnp.int32),
                (t_ids_all, oidx_all, valid_all))
            return counter, dest, val
        return run

    run_mid = mk(body_mid)
    run_last = mk(body_last)
    c1, d1, v1 = run_mid(t_ids_all, oidx_all, valid_all)
    c2, d2, v2 = run_last(t_ids_all, oidx_all, valid_all)
    print("counter equal:", bool((c1 == c2).all()),
          " dest equal:", bool((d1 == d2).all()))
    timeit("rank scan slot-axis-middle (current)", run_mid,
           t_ids_all, oidx_all, valid_all)
    timeit("rank scan slot-axis-last", run_last,
           t_ids_all, oidx_all, valid_all)


if __name__ == "__main__":
    main()
