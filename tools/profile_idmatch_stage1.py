"""Head-to-head kernel profile at the nuScenes stage-1 shape.

Compares, at (V=120000, C=16, Cout=16, K=27, grid (41,1440,1440)):
  A. positional packed conv given a prebuilt rulebook (``_raw_packed``);
  B. rulebook build alone (position table + subm lookup);
  C. packed-ID conv (``_raw_idmatch_packed``) incl. the arithmetic
     qids build;
  D. unpacked-ID conv with a raised VMEM budget, if it compiles.

Chained-scan methodology (STATUS.md): N iterations data-dependently
chained inside one ``lax.scan``; perturbations pass through a relu so
XLA cannot factor them out.

Run: ``python tools/profile_idmatch_stage1.py [V] [C] [n_iters]``.
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
    from uni3detr_tpu.ops.sparse_conv import (
        build_position_table, subm_neighbor_idx, subm_query_ids,
        linear_ids)
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
    ids = jax.jit(lambda c, m: linear_ids(c[0], m[0], grid)[None]
                  )(coords_j, mask_j)
    qids = jax.jit(lambda c, m: subm_query_ids(c[0], m[0], grid)[None]
                   )(coords_j, mask_j)
    jax.block_until_ready((nb, ids, qids))

    def timed(name, fn, x0):
        # host-fetch + 2N-minus-N (axon block_until_ready does not wait)
        import functools as _ft

        def step(x, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            xp = x + jax.nn.relu(
                jax.random.uniform(key, (), x.dtype) * 1e-6)
            out = fn(xp)
            carry = x + (out.astype(jnp.float32).ravel()[::4097][:8].sum()
                         * 1e-20).astype(x.dtype)
            return carry, out.astype(jnp.float32).ravel()[0]

        @_ft.partial(jax.jit, static_argnames=("n",))
        def prog(x, n):
            return jax.lax.scan(step, x, jnp.arange(n))[1][-1]
        np.asarray(prog(x0, n_iters))
        np.asarray(prog(x0, 2 * n_iters))
        t0 = time.perf_counter()
        np.asarray(prog(x0, n_iters))
        t1 = time.perf_counter()
        np.asarray(prog(x0, 2 * n_iters))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / n_iters * 1e3
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    timed("A positional packed conv (rulebook given)",
          lambda x: scp._raw_packed(x, nb, w), feats)
    if scp._unpacked_fits(V):
        timed("A2 positional unpacked conv (rulebook given)",
              lambda x: scp._raw_unpacked(x, nb, w), feats)
    if scp.idmatch_fits(V):
        timed("C2 unpacked-ID conv (ids/qids given)",
              lambda x: scp._raw_idmatch(x, ids, qids, w), feats)

    def build_rb(x):
        c = coords_j + jnp.zeros((), jnp.int32) * x[
            0, 0, 0].astype(jnp.int32)
        nbx = subm_neighbor_idx(c[0], mask_j[0], grid)[None]
        return nbx[..., :1].astype(jnp.float32)
    timed("B rulebook build (table + subm lookup)", build_rb, feats)

    def idpath(x):
        return scp._raw_idmatch_packed(x, ids, qids, w)
    timed("C packed-ID conv (ids/qids given)", idpath, feats)

    def idbuild(x):
        c = coords_j + jnp.zeros((), jnp.int32) * x[
            0, 0, 0].astype(jnp.int32)
        i2 = linear_ids(c[0], mask_j[0], grid)[None]
        q2 = subm_query_ids(c[0], mask_j[0], grid)[None]
        return (i2[..., None] + q2[..., :1]).astype(jnp.float32)
    timed("D id/qid build (arithmetic)", idbuild, feats)

    def pallas_rulebook(x):
        c = coords_j + jnp.zeros((), jnp.int32) * x[
            0, 0, 0].astype(jnp.int32)
        i2 = linear_ids(c[0], mask_j[0], grid)[None]
        q2 = subm_query_ids(c[0], mask_j[0], grid)[None]
        nbx = scp.match_positions(i2, q2, V)
        return nbx[..., :1].astype(jnp.float32)
    timed("E Pallas rulebook (id build + matcher)", pallas_rulebook,
          feats)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(v) for v in a))
