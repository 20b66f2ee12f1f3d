"""TILE/WIN sweep of BOTH positional kernels at the SUN RGB-D per-stage
shapes with CLUSTERED site ids (the walk's pass count depends on local
density, which uniform ids understate).

Round-5 hypothesis: the one-hot gather's MXU cost is its AREA —
(T x window) per (tile, offset) — so
- unpacked kernel (the dispatch winner whenever the raw table fits VMEM,
  i.e. every SUN RGB-D stage): area = T x WIN with both fixed at 512 =
  4 contraction chunks per streamed row; T=WIN=128 cuts the area 16x at
  the price of 4x more tiles (per-tile fixed cost);
- packed kernel: window is already narrowed to ~TILE/R packed rows, so
  at C>=32 (R<=4) TILE=512 forces win=256/384; TILE=64*R keeps the
  128-lane floor.

Run: ``python tools/measure_tile_stages.py`` on the TPU host.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ITERS = 20


def clustered_sites(rng, grid, V):
    """Contiguous boxes of cells (test_torch_import.clustered_cloud
    style) — solid surfaces, high local density along sorted ids."""
    D, H, W = grid
    lim = np.asarray([W, H, D])
    cells = []
    while sum(len(c) for c in cells) < V * 2:
        ext = rng.randint(4, 10, 3)
        c0 = (rng.rand(3) * np.maximum(lim - ext - 1, 1)).astype(np.int64)
        ax = [np.arange(c0[i], min(c0[i] + ext[i], lim[i] - 1))
              for i in range(3)]
        bx, by, bz = np.meshgrid(*ax, indexing="ij")
        cells.append(np.stack([bz.ravel(), by.ravel(), bx.ravel()], -1))
    cells = np.unique(np.concatenate(cells), axis=0)
    lin = (cells[:, 0] * H + cells[:, 1]) * W + cells[:, 2]
    order = np.argsort(lin)[:V]
    return cells[np.sort(order)]


def main():
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.ops.sparse_conv import (subm_neighbor_idx,
                                              build_position_table)
    from uni3detr_tpu.ops import sparse_conv_pallas as scp

    rng = np.random.RandomState(0)

    def timed(fn, args):
        # NOTE: a scalar HOST FETCH ends the timed region — on the axon
        # remote-TPU platform block_until_ready alone does not reliably
        # wait for execution (bench.py learned the same; its comment
        # "host fetch forces true completion"). The fetch latency is
        # amortized over N_ITERS chained iterations.
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(a, n):
            def body(a, i):
                out = fn(*a)
                return ((a[0] + out.astype(jnp.float32).sum() * 1e-9
                         ).astype(a[0].dtype), *a[1:]), ()
            final, _ = jax.lax.scan(body, a, jnp.arange(n))
            return final[0].astype(jnp.float32).ravel()[0]
        # difference of 2N-iter and N-iter runs cancels the constant
        # dispatch + fetch overhead exactly
        float(np.asarray(run(args, N_ITERS)))
        float(np.asarray(run(args, 2 * N_ITERS)))
        t0 = time.perf_counter()
        float(np.asarray(run(args, N_ITERS)))
        t1 = time.perf_counter()
        float(np.asarray(run(args, 2 * N_ITERS)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / N_ITERS * 1e3

    # SUN RGB-D per-stage (grid, V, C); grids follow the (2,2,2) strides
    cases = [((128, 320, 320), 40000, 16),
             ((64, 160, 160), 28000, 32),
             ((32, 80, 80), 12000, 64),
             ((16, 40, 40), 4800, 128)]
    results = {}
    for grid, V, C in cases:
        coords = clustered_sites(rng, grid, V)[None].astype(np.int32)
        mask = np.ones((1, V), bool)
        table = jax.jit(lambda c, m: build_position_table(
            c[0], m[0], grid)[None])(jnp.asarray(coords),
                                     jnp.asarray(mask))
        nb = jax.jit(lambda c, m, t: subm_neighbor_idx(
            c[0], m[0], grid, 3, t[0])[None])(
            jnp.asarray(coords), jnp.asarray(mask), table)
        jax.block_until_ready(nb)
        x = jnp.asarray(rng.randn(1, V, C).astype(np.float32)).astype(
            jnp.bfloat16)
        w = jnp.asarray((rng.randn(27, C, C) * 0.1).astype(
            np.float32)).astype(jnp.bfloat16)
        row = {}
        ref = None

        def case(label, fn):
            nonlocal ref
            try:
                out = fn(x, nb, w)
                jax.block_until_ready(out)
                got = np.asarray(out, np.float32)
                if ref is None:
                    ref = got
                else:
                    err = np.abs(got - ref).max()
                    assert err < 2e-1, (label, err)
                row[label] = round(timed(fn, (x, nb, w)), 3)
            except Exception as e:  # noqa: BLE001
                row[label] = f"fail: {type(e).__name__}: {str(e)[:60]}"

        for tile, win in ((512, 512), (256, 256), (128, 128), (256, 128)):
            case(f"unpacked T={tile} W={win}",
                 lambda x_, nb_, w_, t=tile, wn=win: scp._raw_unpacked(
                     x_, nb_, w_, tile=t, win=wn))
        R = 128 // scp._cpad(C)
        for tile in sorted({512, 256, 128, max(128, 64 * R)}):
            case(f"packed T={tile}",
                 lambda x_, nb_, w_, t=tile: scp._raw_packed(
                     x_, nb_, w_, tile=t))
        results[f"V={V},C={C}"] = row
        print(json.dumps({f"V={V},C={C}": row}), flush=True)
    print(json.dumps({"chip": jax.devices()[0].device_kind,
                      "results": results}))


if __name__ == "__main__":
    main()
