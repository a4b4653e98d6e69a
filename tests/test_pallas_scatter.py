"""Serial Pallas scatter-add vs jnp .at[].add (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from fourdgs_tpu.ops.pallas.scatter import scatter_add_rows


def test_matches_xla_scatter_add(rng):
    m, w, n = 200, 16, 37
    rows = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    want = jnp.zeros((n, w), jnp.float32).at[idx].add(rows)
    got = scatter_add_rows(idx, rows, n_out=n, blk=8, unroll=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_out_of_range_rows_dropped_to_sacrificial(rng):
    m, w, n = 64, 16, 16
    rows = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n + 10, m).astype(np.int32))
    got = scatter_add_rows(idx, rows, n_out=n, blk=8, unroll=2)
    clamped = jnp.clip(idx, 0, n - 1)
    want = jnp.zeros((n, w), jnp.float32).at[clamped].add(rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_vmap_batches_correctly(rng):
    """The blend backward runs under vmap for batch > 1; the kernel's
    auto-batching must keep per-batch accumulators independent."""
    b, m, w, n = 3, 96, 16, 21
    rows = jnp.asarray(rng.standard_normal((b, m, w)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m)).astype(np.int32))
    want = jax.vmap(
        lambda i, r: jnp.zeros((n, w), jnp.float32).at[i].add(r))(idx, rows)
    got = jax.vmap(
        lambda i, r: scatter_add_rows(i, r, n_out=n, blk=8, unroll=4))(
            idx, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_scatter_set_scalars_matches_xla():
    from fourdgs_tpu.ops.pallas.scatter import scatter_set_scalars
    rng = np.random.default_rng(5)
    n_out, m = 1000, 4096
    idx = np.asarray(rng.permutation(n_out + 200)[:m % (n_out + 200)]
                     if False else rng.permutation(n_out + 200), np.int32)
    idx = idx[:600]                       # unique, some >= n_out (dropped)
    val = np.asarray(rng.integers(0, 10**6, len(idx)), np.int32)
    got = np.asarray(scatter_set_scalars(
        jnp.minimum(jnp.asarray(idx), n_out), jnp.asarray(val),
        n_out=n_out))
    want = np.full(n_out, -1, np.int64)
    for i, v in zip(idx, val):
        if i < n_out:
            want[i] = v
    np.testing.assert_array_equal(got, want)
