"""TILE sweep for the positional packed sparse-conv kernel at big-V
stages (nuScenes stage-1 shape by default).

The packed kernel walks >=1 window pass per (tile, offset); at V=120k
and TILE=512 that is >=27*235 passes/conv, and profiling shows the conv
is pass-count-bound (9.7 ms measured vs <1 ms of MXU work). Doubling
TILE halves the tile count (per-pass fixed cost) at the price of wider
per-pass vector work. This tool monkeypatches ``sparse_conv_pallas.TILE``
(read at trace time) and re-times the conv per setting.

Run: ``python tools/measure_tile.py [V] [C] [n_iters]``.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(V=120000, C=16, n_iters=20):
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.ops.sparse_conv import subm_neighbor_idx
    from uni3detr_tpu.ops import sparse_conv_pallas as scp

    grid = (41, 1440, 1440)
    K, Cout = 27, C
    rng = np.random.RandomState(0)
    lin = np.sort(rng.choice(np.prod(grid), V, replace=False))
    D, H, W = grid
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W],
                      -1).astype(np.int32)[None]
    mask = np.ones((1, V), bool)
    coords_j = jnp.asarray(coords)
    mask_j = jnp.asarray(mask)
    feats = jnp.asarray(
        rng.randn(1, V, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.randn(K, C, Cout) * 0.1).astype(np.float32)).astype(
            jnp.bfloat16)
    nb = jax.jit(lambda c, m: subm_neighbor_idx(c[0], m[0], grid)[None]
                 )(coords_j, mask_j)
    jax.block_until_ready(nb)

    import functools

    tiles = tuple(int(t) for t in os.environ.get(
        "UNI3DETR_TILE_SWEEP", "256,512,1024").split(","))
    ref = None
    for tile in tiles:
        scp.TILE = tile
        scp._raw_packed.clear_cache()

        def step(x, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            xp = x + jax.nn.relu(
                jax.random.uniform(key, (), x.dtype) * 1e-6)
            out = scp._raw_packed(xp, nb, w)
            carry = x + (out.astype(jnp.float32).ravel()[::4097][:8].sum()
                         * 1e-20).astype(x.dtype)
            return carry, out.astype(jnp.float32).ravel()[:4]

        @functools.partial(jax.jit, static_argnames=("n",))
        def prog(x, n):
            return jax.lax.scan(step, x, jnp.arange(n))[1]
        # host fetch (axon block_until_ready does not wait) + 2N-minus-N
        # overhead cancellation
        outs = np.asarray(prog(feats, n_iters))
        if ref is None:
            ref = outs
        else:
            assert np.allclose(outs, ref, atol=1e-3), (tile, outs, ref)
        np.asarray(prog(feats, 2 * n_iters))
        t0 = time.perf_counter()
        np.asarray(prog(feats, n_iters))
        t1 = time.perf_counter()
        np.asarray(prog(feats, 2 * n_iters))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / n_iters * 1e3
        print(f"TILE={tile:5d}  {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
