"""Micro-profile of the sparse encoder's building blocks on TPU.

The stage profile (tools/profile_stages.py) shows the sparse encoder
dominating e2e inference; this times each primitive at flagship SUN RGB-D
shapes to locate the cost: position-table build, rulebook lookups, the
gather, the GEMM, masked BN, downsample site-set, final densify.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ITERS = 20


def main():
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.ops.sparse_conv import (
        build_position_table, subm_neighbor_idx, gather_conv,
        downsample_sites)
    from uni3detr_tpu.ops.voxelize import scatter_to_dense

    grid = (128, 320, 320)
    V = 40000
    rng = np.random.RandomState(0)
    lin = np.sort(rng.choice(np.prod(grid), V, replace=False))
    D, H, W = grid
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W],
                      -1).astype(np.int32)
    mask = np.ones(V, bool)
    coords_j = jnp.asarray(coords)[None]
    mask_j = jnp.asarray(mask)[None]

    def timed(fn, *args, n=N_ITERS):
        """Chained-scan timing (bench.py methodology): every input is
        rolled along axis 0 by an output-derived shift (0 at runtime but
        unknowable at compile time), so each iteration's inputs are new
        values — an additive perturbation would be hoisted out of a
        linear op (gather(p + d) == gather(p) + d), which is exactly what
        XLA did to the first version of this tool."""
        def leafsum(tree):
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(tree):
                s += leaf.astype(jnp.float32).sum()
            return s

        @jax.jit
        def run(args):
            def body(a, i):
                out = fn(*a)
                shift = (leafsum(out) > 1e30).astype(jnp.int32)
                return tuple(jnp.roll(x, shift, axis=0) for x in a), ()
            final, _ = jax.lax.scan(body, args, jnp.arange(n))
            return final
        args = tuple(jnp.asarray(a) for a in args)
        r = run(args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    results = {}
    vb = jax.vmap(build_position_table, in_axes=(0, 0, None))
    results["position_table"] = timed(lambda c, m: vb(c, m, grid),
                                      coords_j, mask_j)
    table = vb(coords_j, mask_j, grid)
    vnb = jax.vmap(subm_neighbor_idx, in_axes=(0, 0, None, None, 0))
    results["subm_rulebook"] = timed(
        lambda c, m, t: vnb(c, m, grid, 3, t), coords_j, mask_j, table)
    nb = vnb(coords_j, mask_j, grid, 3, table)

    for cin, cout in ((16, 16), (64, 64), (128, 128)):
        feats = jnp.asarray(rng.randn(1, V, cin).astype(np.float32)
                            ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.02)
        results[f"gather_conv_{cin}x{cout}"] = timed(
            lambda f, n_, w_: jax.vmap(gather_conv,
                                       in_axes=(0, 0, None))(f, n_, w_),
            feats, nb, w)
        # split: gather alone vs GEMM alone
        padded = jnp.concatenate(
            [feats[0], jnp.zeros((1, cin), feats.dtype)], 0)
        results[f"gather_only_{cin}"] = timed(
            lambda p, n_: p[n_], padded, nb[0])
        g = padded[nb[0]]
        results[f"gemm_only_{cin}x{cout}"] = timed(
            lambda g_, w_: jax.lax.dot_general(
                g_.reshape(V, 27 * cin),
                w_.reshape(27 * cin, cout).astype(g_.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), g, w)

    results["downsample_sites"] = timed(
        lambda c, m: jax.vmap(
            lambda cc, mm: downsample_sites(cc, mm, grid, (1, 1, 1),
                                            V)[:2])(c, m),
        coords_j, mask_j)
    feats256 = jnp.asarray(rng.randn(1, V, 256).astype(np.float32)
                           ).astype(jnp.bfloat16)
    small_grid = (16, 40, 40)
    lin2 = np.sort(rng.choice(np.prod(small_grid), 10000, replace=False))
    c2 = np.stack([lin2 // (small_grid[1] * small_grid[2]),
                   (lin2 // small_grid[2]) % small_grid[1],
                   lin2 % small_grid[2]], -1).astype(np.int32)
    results["scatter_to_dense_/8"] = timed(
        lambda f, c, m: scatter_to_dense(f[:, :10000], c, m, small_grid),
        feats256, jnp.asarray(c2)[None], jnp.ones((1, 10000), bool))

    print(json.dumps({"chip": jax.devices()[0].device_kind,
                      "V": V, "grid": grid,
                      "ms": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
