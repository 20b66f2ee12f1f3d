"""Micro-benchmark of the voxelizer's argsort on the TPU.

The hard-voxelize path is one argsort over P int32 linear voxel ids
(ops/voxelize.py::_voxelize_single) plus bandwidth passes; if the
voxelize stage is sort-bound, the levers are (a) unstable lax.sort,
(b) fewer payload bytes through the variadic sort, (c) pre-bucketing.
This times the isolated variants at the preset point budgets so the
choice follows data.

Run: ``python tools/measure_sort.py`` on the TPU host.
"""
import functools
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
    from jax import lax

    results = {}

    def timed(name, fn, *args):
        # scalar host fetch ends the timed region (axon: block_until_ready
        # alone does not reliably wait — see bench.py "host fetch forces
        # true completion"); fetch latency amortizes over N_ITERS
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(a, n):
            def body(c, i):
                out = fn(*c)
                first = jax.tree_util.tree_leaves(out)[0]
                bump = (first.ravel()[0].astype(jnp.int32) & 1)
                return (c[0] + bump, *c[1:]), ()
            final, _ = lax.scan(body, a, jnp.arange(n))
            return final[0].ravel()[0]
        # 2N-minus-N difference cancels dispatch + fetch overhead
        float(np.asarray(run(args, N_ITERS)))
        float(np.asarray(run(args, 2 * N_ITERS)))
        t0 = time.perf_counter()
        float(np.asarray(run(args, N_ITERS)))
        t1 = time.perf_counter()
        float(np.asarray(run(args, 2 * N_ITERS)))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / N_ITERS * 1e3
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    rng = np.random.RandomState(0)
    for P, maxid, tag in ((131072, 128 * 320 * 320, "sunrgbd_128k"),
                          (327680, 41 * 1440 * 1440, "nusc_320k")):
        keys = jnp.asarray(
            rng.randint(0, maxid, P).astype(np.int32))
        pts = jnp.asarray(rng.rand(P, 4).astype(np.float32))

        timed(f"{tag}/argsort_stable",
              lambda k: jnp.argsort(k), keys)
        timed(f"{tag}/argsort_unstable",
              lambda k: lax.sort((k, jnp.arange(P, dtype=jnp.int32)),
                                 num_keys=1, is_stable=False)[1], keys)
        timed(f"{tag}/sort_keys_only",
              lambda k: lax.sort((k,), num_keys=1, is_stable=False)[0],
              keys)
        # sort the full point payload through the variadic sort instead
        # of gathering rows afterwards
        timed(f"{tag}/sort_with_payload4",
              lambda k, p: lax.sort(
                  (k, p[:, 0], p[:, 1], p[:, 2], p[:, 3]), num_keys=1,
                  is_stable=False), keys, pts)
        # current production composite: stable argsort + (P,4) row gather
        timed(f"{tag}/argsort_plus_gather",
              lambda k, p: p[jnp.argsort(k)], keys, pts)

    print(json.dumps({"chip": jax.devices()[0].device_kind,
                      "n_iters": N_ITERS, "ms": results}))


if __name__ == "__main__":
    main()
