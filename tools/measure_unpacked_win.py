"""(tile, win) sweep for the UNPACKED positional conv at GS=9.

At the default GS=9 walk the group window spans the tile's neighbor rows
plus the dy offsets' +-W*density spread; win=512 then needs ~2 passes
per group. A wider window trades per-pass area for pass count. Honest
host-fetch 2N-minus-N harness.

Run: ``python tools/measure_unpacked_win.py [V] [C]`` on the TPU host.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.measure_tile_stages import clustered_sites  # noqa: E402

N_ITERS = 20


def main(V=40000, C=16):
    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from uni3detr_tpu.ops.sparse_conv import (subm_neighbor_idx,
                                              build_position_table)
    from uni3detr_tpu.ops import sparse_conv_pallas as scp

    grid = (128, 320, 320)
    rng = np.random.RandomState(0)
    coords = clustered_sites(rng, grid, V)[None].astype(np.int32)
    mask = np.ones((1, V), bool)
    table = jax.jit(lambda c, m: build_position_table(
        c[0], m[0], grid)[None])(jnp.asarray(coords), jnp.asarray(mask))
    nb = jax.jit(lambda c, m, t: subm_neighbor_idx(
        c[0], m[0], grid, 3, t[0])[None])(
        jnp.asarray(coords), jnp.asarray(mask), table)
    x = jnp.asarray(rng.randn(1, V, C).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray((rng.randn(27, C, C) * 0.1).astype(
        np.float32)).astype(jnp.bfloat16)

    def timed(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x_, n):
            def body(a, i):
                out = fn(a)
                return (a + out.astype(jnp.float32).sum() * 1e-9
                        ).astype(a.dtype), ()
            final, _ = jax.lax.scan(body, x_, jnp.arange(n))
            return final.astype(jnp.float32).ravel()[0]
        float(np.asarray(run(x, N_ITERS)))
        float(np.asarray(run(x, 2 * N_ITERS)))
        t0 = time.perf_counter()
        float(np.asarray(run(x, N_ITERS)))
        t1 = time.perf_counter()
        float(np.asarray(run(x, 2 * N_ITERS)))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / N_ITERS * 1e3

    for tile, win in ((512, 512), (512, 768), (512, 1024), (1024, 1024),
                      (256, 512)):
        ms = timed(lambda a, t=tile, wn=win: scp._raw_unpacked(
            a, nb, w, tile=t, win=wn))
        print(f"unpacked T={tile} W={win}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
