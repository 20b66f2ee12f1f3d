"""Pallas TPU kernel: sparse gather-conv as windowed one-hot MXU matmuls.

Why: the sparse conv's gather (``gather_conv`` in ops/sparse_conv.py)
reads (V, K) arbitrary rows from the feature list. XLA lowers that to a
descriptor-per-row HBM gather measured at ~5 ns/row on a v5e — ~5.5 ms
per conv at the SUN RGB-D eval budget (V=40k, K=27), and the encoder's
~15 convs dominate e2e inference (94 of 120 ms). Mosaic's native
``dynamic_gather`` only shuffles within one (8, 128) vreg, so a general
gather must be *computed*, not issued: this kernel turns the gather into
dense MXU work.

How: the voxel list is sorted by linear id and each kernel offset k adds
a constant to the id, so the neighbor row index ``idx[:, k]`` is
monotone non-decreasing in v. For a tile of T consecutive outputs the
valid neighbors of offset k live in a narrow row window; the kernel
slices that window from the VMEM-resident feature list and selects rows
with a one-hot (T, WIN) @ (WIN, C) matmul — exact (each output row sums
exactly one bf16 value), and MXU-bound instead of descriptor-bound. A
data-dependent ``while_loop`` walks the window forward in WIN-row steps
until every valid neighbor of the tile is covered, so density spikes
cost extra passes instead of wrong results.

The backward also runs on these kernels: for submanifold rulebooks the
neighbor relation is symmetric (``n(v, k) = u  <=>  n(u, K-1-k) = v``),
so ``d features`` is the SAME windowed gather-conv applied to the
output cotangent with kernel-flipped transposed weights, and
``d weights`` contracts the materialized gathered rows (a weights-free
variant of the kernel) against the cotangent — no XLA scatter anywhere.
Strided rulebooks (3 of ~15 convs, asymmetric site sets) fall back to
the XLA formulation for ``d features``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512     # output rows per grid step (multiple of 8)
WIN = 512      # window rows per pass (multiple of 128; MXU contraction)


def _kernel(starts_ref, idx_ref, src_ref, w_ref, out_ref, *, K, v_dummy):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    T = idx_ref.shape[1]
    Vp, C = src_ref.shape[1:]      # row v_dummy is the zero dummy
    Cout = out_ref.shape[-1]
    ids = idx_ref[0]               # (T, K) int32
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, WIN), 1)
    acc = jnp.zeros((T, Cout), jnp.float32)
    # one window walk PER OFFSET: most offsets have no valid neighbor in
    # a tile at real occupancies, and their while_loop exits before doing
    # any vector work — measured faster in-model than a shared walk or
    # unconditional variants (which pay 27 one-hot matmuls per pass)
    for k in range(K):
        col = ids[:, k:k + 1]                      # (T, 1)
        valid = col != v_dummy
        w0 = starts_ref[(b * n_tiles + t) * K + k]  # SMEM scalar
        # 16-aligned window starts (bf16 sublane granularity for dynamic
        # VMEM slices)
        covered0 = (jnp.maximum(w0, 0) // 16) * 16

        def cond(state):
            covered, _ = state
            return jnp.any(valid & (col >= covered))

        def body(state):
            covered, acc = state
            base = jnp.minimum(covered, Vp - WIN)  # Vp % 16 == 0: aligned
            base = pl.multiple_of(base, 16)
            window = src_ref[0, pl.ds(base, WIN), :]  # (WIN, C)
            accept = valid & (col >= covered) & (col < base + WIN)
            rel = col - base
            onehot = (accept & (rel == col_iota)).astype(src_ref.dtype)
            g = jax.lax.dot_general(
                onehot, window, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = g.astype(src_ref.dtype)            # exact: one term per row
            acc = acc + jax.lax.dot_general(
                g, w_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return base + WIN, acc

        _, acc = jax.lax.while_loop(cond, body, (covered0, acc))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_conv_pallas_raw(features, neighbor_idx, weights,
                            interpret: bool = False):
    """features (B, V, C); neighbor_idx (B, Vout, K) with V = missing;
    weights (K, C, Cout). Returns (B, Vout, Cout). The batch folds into
    the kernel grid (one feature table resident per grid row)."""
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    # dummy row at index V; then pad rows so Vp is a multiple of 16 and
    # >= WIN (keeps every clamped window start 16-aligned and in range)
    Vp = max(-(-(V + 1) // 16) * 16, WIN)
    padded = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    n_tiles = -(-Vout // TILE)
    pad_rows = n_tiles * TILE - Vout
    idx = jnp.concatenate(
        [neighbor_idx,
         jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)  # dummies
    # per-(batch, tile, offset) window start: min valid neighbor row
    tiled = idx.reshape(B, n_tiles, TILE, K)
    big = jnp.where(tiled == V, jnp.iinfo(jnp.int32).max, tiled)
    starts = jnp.min(big, axis=2).reshape(-1)        # (B*n_tiles*K,)
    starts = jnp.where(starts == jnp.iinfo(jnp.int32).max, 0, starts)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda b, t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, v_dummy=V),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        interpret=interpret,
    )(starts, idx, padded, weights.astype(dtype))
    return out[:, :Vout]


def _gather_rows_kernel(starts_ref, idx_ref, src_ref, out_ref, *, K,
                        v_dummy):
    """Weights-free variant: materialize the gathered rows (T, K*C)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    T = idx_ref.shape[1]
    Vp, C = src_ref.shape[1:]
    ids = idx_ref[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, WIN), 1)
    out_ref[0] = jnp.zeros((T, K * C), out_ref.dtype)
    for k in range(K):
        col = ids[:, k:k + 1]
        valid = col != v_dummy
        w0 = starts_ref[(b * n_tiles + t) * K + k]
        covered0 = (jnp.maximum(w0, 0) // 16) * 16

        def cond(covered):
            return jnp.any(valid & (col >= covered))

        def body(covered):
            base = jnp.minimum(covered, Vp - WIN)
            base = pl.multiple_of(base, 16)
            window = src_ref[0, pl.ds(base, WIN), :]
            accept = valid & (col >= covered) & (col < base + WIN)
            rel = col - base
            onehot = (accept & (rel == col_iota)).astype(src_ref.dtype)
            g = jax.lax.dot_general(
                onehot, window, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, :, k * C:(k + 1) * C] += g.astype(out_ref.dtype)
            return base + WIN

        jax.lax.while_loop(cond, body, covered0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(features, neighbor_idx, interpret: bool = False):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    Vp = max(-(-(V + 1) // 16) * 16, WIN)
    padded = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    n_tiles = -(-Vout // TILE)
    pad_rows = n_tiles * TILE - Vout
    idx = jnp.concatenate(
        [neighbor_idx, jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)
    tiled = idx.reshape(B, n_tiles, TILE, K)
    big = jnp.where(tiled == V, jnp.iinfo(jnp.int32).max, tiled)
    starts = jnp.min(big, axis=2).reshape(-1)
    starts = jnp.where(starts == jnp.iinfo(jnp.int32).max, 0, starts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * C),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel, K=K, v_dummy=V),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * C), dtype),
        interpret=interpret,
    )(starts, idx, padded)
    return out[:, :Vout]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_conv_pallas(features, neighbor_idx, weights,
                       symmetric: bool = False):
    """TPU sparse conv: forward via the windowed one-hot kernel.
    Batched: (B, V, C) x (B, Vout, K) -> (B, Vout, Cout).

    ``symmetric=True`` marks a submanifold rulebook (n(v,k)=u iff
    n(u,K-1-k)=v): d features then reuses this same kernel with
    kernel-flipped transposed weights; otherwise (strided) it falls back
    to XLA's scatter-add. d weights always contracts the Pallas-gathered
    rows against the cotangent."""
    return _gather_conv_pallas_raw(features, neighbor_idx, weights)


def _xla_gather_conv(features, neighbor_idx, weights):
    """Batched XLA reference formulation (strided bwd + goldens)."""
    def one(f, n):
        V, Cin = f.shape
        Vout, K = n.shape
        padded = jnp.concatenate(
            [f, jnp.zeros((1, Cin), f.dtype)], axis=0)
        gathered = padded[n]
        w = weights.reshape(K * Cin, -1).astype(f.dtype)
        return jax.lax.dot_general(
            gathered.reshape(Vout, K * Cin), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(f.dtype)
    return jax.vmap(one)(features, neighbor_idx)


def _fwd(features, neighbor_idx, weights, symmetric):
    # (this JAX passes nondiff args to fwd at their original positions,
    # and first to bwd)
    return _gather_conv_pallas_raw(features, neighbor_idx, weights), (
        features, neighbor_idx, weights)


def _bwd(symmetric, res, g):
    features, neighbor_idx, weights = res
    K, C, Cout = weights.shape
    # dW[k] = sum_{b,v} gathered[b,v,k,:]^T dout[b,v,:]
    rows = gather_rows_pallas(features, neighbor_idx)   # (B, Vout, K*C)
    dw = jnp.einsum("bvx,bvo->xo", rows.astype(jnp.float32),
                    g.astype(jnp.float32)).reshape(K, C, Cout)
    dw = dw.astype(weights.dtype)
    if symmetric:
        # dfeats[u] = sum_k dout[n(u,k)] @ W[K-1-k]^T — the same
        # windowed gather-conv on the cotangent
        wb = jnp.swapaxes(weights[::-1], 1, 2)          # (K, Cout, C)
        df = _gather_conv_pallas_raw(g.astype(features.dtype),
                                     neighbor_idx, wb)
    else:
        _, vjp = jax.vjp(
            lambda f: _xla_gather_conv(f, neighbor_idx, weights),
            features)
        df, = vjp(g)
    return df.astype(features.dtype), None, dw


gather_conv_pallas.defvjp(_fwd, _bwd)
