"""Pallas TPU kernel: sparse gather-conv as windowed one-hot MXU matmuls.

Why: the sparse conv's gather (``gather_conv`` in ops/sparse_conv.py)
reads (V, K) arbitrary rows from the feature list. XLA lowers that to a
descriptor-per-row HBM gather measured at ~5 ns/row on a v5e — ~5.5 ms
per conv at the SUN RGB-D eval budget (V=40k, K=27), and the encoder's
~15 convs dominated e2e inference (94 of 120 ms). Mosaic's native
``dynamic_gather`` only shuffles within one (8, 128) vreg, so a general
gather must be *computed*, not issued: this kernel turns the gather into
dense MXU work.

How: the voxel list is sorted by linear id and each kernel offset k adds
a constant to the id, so the neighbor row index ``idx[:, k]`` is
monotone non-decreasing in v. The feature list is *lane-packed*: R =
128/C consecutive rows share one 128-lane VMEM row, so the resident
table costs ~V*Cp*2 bytes instead of the V*256 a (V, C) layout pays
under (8,128) tiling (nuScenes' 120k-voxel budget fits in 1.9 MB
instead of 30 MB). For a tile of T consecutive outputs and offset k the
valid neighbors live in a narrow packed-row window; an exact one-hot
(T, WIN) @ (WIN, R*Cp) matmul at full 128-lane MXU width selects the
packed rows, and an R-way lane-group mask extracts each neighbor's own
channels. A data-dependent ``while_loop`` walks the window forward so
density spikes cost extra passes instead of correctness; offsets with
no valid neighbor in a tile skip all vector work (measured faster
in-model than shared-walk or unconditional variants).

The backward also runs on these kernels: for submanifold rulebooks the
neighbor relation is symmetric (``n(v, k) = u  <=>  n(u, K-1-k) = v``),
so ``d features`` is the SAME windowed gather-conv applied to the
output cotangent with kernel-flipped transposed weights, and
``d weights`` contracts the materialized gathered rows (a weights-free
variant of the kernel) against the cotangent — no XLA scatter anywhere.
Strided rulebooks use the inverse rulebook
(``strided_inverse_neighbor_idx``) the same way — no fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512     # output rows per grid step (multiple of 8)
WIN = 512      # packed window rows per pass (multiple of 128)


def _cpad(C: int) -> int:
    """Smallest power of two >= C (capped at 128) so R = 128/Cp is whole."""
    p = 1
    while p < C:
        p *= 2
    return min(p, 128)


def pallas_fits(V: int, C: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Whether the packed feature table + scratch fit VMEM for (V, C).

    The packed table costs VpP * 256 bytes (128 bf16 lanes per packed
    row); with lane packing even nuScenes' 120k x C=16 stage needs only
    ~3.8 MB. Callers fall back to the XLA gather above the budget."""
    Cp = _cpad(C)
    R = 128 // Cp
    VpP = max(-(-(V + 1) // (16 * R)) * 16, WIN)
    scratch = TILE * 27 * Cp * 2
    return VpP * 256 + scratch <= budget_bytes


def _select_group(g_packed, lane_grp, R, Cp):
    """(T, R*Cp) packed gather result -> (T, Cp) rows' own lane group."""
    g = jnp.zeros_like(g_packed[:, :Cp])
    for j in range(R):
        sel = lane_grp == j
        g = jnp.where(sel, g_packed[:, j * Cp:(j + 1) * Cp], g)
    return g


def _win_rows(R: int) -> int:
    """Window rows per walk pass for packing factor R.

    A tile's T=TILE queries land on ~TILE/R consecutive packed rows
    (packed row = position // R), so a WIN-row window at R=8 computed an
    8x-too-wide one-hot matmul. Narrowing the window to the rows a tile
    can actually touch (plus boundary slack, rounded to the 128-lane MXU
    contraction) cut the positional packed conv 12.5 -> 4.5 ms at the
    nuScenes stage-1 shape (V=120k, C=16)."""
    return max(128, -(-(TILE // R + 64) // 128) * 128)


def _walk(colp, valid_k, w0, src_ref, VpP, on_pass, win: int = WIN):
    """Shared window-walk scaffolding for one offset column.

    colp (T, 1) packed-row indices (-1 for invalid); w0 packed-row start
    (SMEM scalar); calls ``on_pass(g_packed)`` with the exact packed-row
    one-hot gather of each pass. Window starts are 16-aligned (bf16
    sublane granularity for dynamic VMEM slices; VpP % 16 == 0 keeps
    the clamp aligned)."""
    T = colp.shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1)
    covered0 = (jnp.maximum(w0, 0) // 16) * 16

    def cond(covered):
        return jnp.any(valid_k & (colp >= covered))

    def body(covered):
        base = jnp.minimum(covered, VpP - win)
        base = pl.multiple_of(base, 16)
        window = src_ref[0, pl.ds(base, win), :]   # (win, R*Cp)
        accept = valid_k & (colp >= covered) & (colp < base + win)
        onehot = (accept & (colp - base == col_iota)).astype(
            src_ref.dtype)
        g_packed = jax.lax.dot_general(
            onehot, window, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        on_pass(g_packed)
        return base + win

    jax.lax.while_loop(cond, body, covered0)


def _kernel_packed(starts_ref, idx_ref, src_ref, w_ref, out_ref, g_ref, *,
            K, v_dummy, R, Cp):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    VpP = src_ref.shape[1]
    ids = idx_ref[0]               # (T, K) int32
    g_ref[:] = jnp.zeros_like(g_ref)
    for k in range(K):
        col = ids[:, k:k + 1]
        valid = col != v_dummy
        colp = jnp.where(valid, col // R, -1)
        lane_grp = col % R
        w0 = starts_ref[(b * n_tiles + t) * K + k]

        def on_pass(g_packed, k=k, lane_grp=lane_grp):
            g = _select_group(g_packed, lane_grp, R, Cp)
            # exact: each accepted row sums exactly one bf16 value
            g_ref[:, k * Cp:(k + 1) * Cp] += g.astype(g_ref.dtype)

        _walk(colp, valid, w0, src_ref, VpP, on_pass, _win_rows(R))
    # one fused (T, K*Cp) @ (K*Cp, Cout) MXU matmul per tile
    out_ref[0] = jax.lax.dot_general(
        g_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pack_inputs(features, neighbor_idx):
    """Lane-pack features; pad the rulebook to the tile grid."""
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    Cp = _cpad(C)
    R = 128 // Cp
    # dummy row at index V; pad so packed rows are a multiple of 16 and
    # >= the walk window
    VpP = max(-(-(V + 1) // (16 * R)) * 16, _win_rows(R))
    Vp = VpP * R
    feats = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    if Cp > C:
        feats = jnp.concatenate(
            [feats, jnp.zeros((B, Vp, Cp - C), dtype)], axis=2)
    packed = feats.reshape(B, VpP, R * Cp)
    n_tiles = -(-Vout // TILE)
    pad_rows = n_tiles * TILE - Vout
    idx = jnp.concatenate(
        [neighbor_idx,
         jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)
    # per-(batch, tile, offset) packed window start
    tiled = idx.reshape(B, n_tiles, TILE, K)
    big = jnp.where(tiled == V, jnp.iinfo(jnp.int32).max, tiled // R)
    starts = jnp.min(big, axis=2).reshape(-1)
    starts = jnp.where(starts == jnp.iinfo(jnp.int32).max, 0, starts)
    return packed, idx, starts, n_tiles, Cp, R, VpP


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raw_packed(features, neighbor_idx, weights,
                interpret: bool = False):
    """features (B, V, C); neighbor_idx (B, Vout, K) with V = missing;
    weights (K, C, Cout). Returns (B, Vout, Cout). The batch folds into
    the kernel grid (one packed feature table resident per grid row)."""
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    packed, idx, starts, n_tiles, Cp, R, VpP = _pack_inputs(
        features, neighbor_idx)
    w = weights
    if Cp > C:
        w = jnp.concatenate(
            [w, jnp.zeros((K, Cp - C, Cout), w.dtype)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VpP, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cp, Cout), lambda b, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, K * Cp), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_packed, K=K, v_dummy=V, R=R, Cp=Cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        interpret=interpret,
    )(starts, idx, packed, w.reshape(K * Cp, Cout).astype(dtype))
    return out[:, :Vout]


def _gather_rows_kernel_packed(starts_ref, idx_ref, src_ref, out_ref, *, K,
                        v_dummy, R, Cp):
    """Weights-free variant: materialize the gathered rows (T, K*Cp)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    VpP = src_ref.shape[1]
    ids = idx_ref[0]
    out_ref[0] = jnp.zeros_like(out_ref[0])
    for k in range(K):
        col = ids[:, k:k + 1]
        valid = col != v_dummy
        colp = jnp.where(valid, col // R, -1)
        lane_grp = col % R
        w0 = starts_ref[(b * n_tiles + t) * K + k]

        def on_pass(g_packed, k=k, lane_grp=lane_grp):
            g = _select_group(g_packed, lane_grp, R, Cp)
            out_ref[0, :, k * Cp:(k + 1) * Cp] += g.astype(
                out_ref.dtype)

        _walk(colp, valid, w0, src_ref, VpP, on_pass, _win_rows(R))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_packed(features, neighbor_idx, interpret: bool = False):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    packed, idx, starts, n_tiles, Cp, R, VpP = _pack_inputs(
        features, neighbor_idx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VpP, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * Cp),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel_packed, K=K, v_dummy=V, R=R,
                          Cp=Cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * Cp),
                                       dtype),
        interpret=interpret,
    )(starts, idx, packed)
    out = out[:, :Vout]
    if Cp > C:
        out = out.reshape(B, Vout, K, Cp)[..., :C].reshape(
            B, Vout, K * C)
    return out




def _kernel_unpacked(starts_ref, idx_ref, src_ref, w_ref, out_ref, *, K, v_dummy):
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
def _raw_unpacked(features, neighbor_idx, weights,
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
        functools.partial(_kernel_unpacked, K=K, v_dummy=V),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        interpret=interpret,
    )(starts, idx, padded, weights.astype(dtype))
    return out[:, :Vout]


def _gather_rows_kernel_unpacked(starts_ref, idx_ref, src_ref, out_ref, *, K,
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
def _rows_unpacked(features, neighbor_idx, interpret: bool = False):
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
        functools.partial(_gather_rows_kernel_unpacked, K=K, v_dummy=V),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * C), dtype),
        interpret=interpret,
    )(starts, idx, padded)
    return out[:, :Vout]


def _unpacked_fits(V: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """The unpacked kernel's resident table costs Vp * 256 bytes (the
    (V, C) layout pads to 128 lanes under (8,128) tiling)."""
    Vp = max(-(-(V + 1) // 16) * 16, WIN)
    return Vp * 256 <= budget_bytes


# ---------------------------------------------------------------------------
# ID-MATCHING kernels: no rulebook, no position table.
#
# The windowed walk above already computes an exact one-hot per pass; the
# only thing the precomputed rulebook contributed was the positions the
# one-hot compares against. Matching the QUERY LINEAR IDS (site id +
# constant offset, pure arithmetic) against the sorted site-id list
# inside the same walk deletes the whole rulebook pipeline — whose table
# scatter + 27-per-site scalar gathers measured ~53 ms/scene at SUN
# RGB-D eval budgets, more than the rest of the encoder combined.
# Window starts are carried across tiles in SMEM (the TPU grid runs
# sequentially and query columns are monotone over the sorted site
# list), replacing the XLA-side min-reduction prefetch.
# ---------------------------------------------------------------------------

WIN_ID = 1024   # ids per pass = 8 sublane rows x 128 lanes
ROWS_ID = WIN_ID // 128


def idmatch_fits(V: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Resident cost: feature table Vp*256 B (lane padding — independent
    of C<=128) + id blocks Vp*4 B + per-tile scratch."""
    Vp = max(-(-V // WIN_ID) * WIN_ID, WIN_ID)
    return Vp * 256 + Vp * 4 + TILE * 27 * 4 <= budget_bytes


def _accept_block(q, valid, idblk):
    """(T, 1) query ids vs an (ROWS_ID, 128) id block -> (T, WIN_ID)
    accept mask. Eight VPU compares concatenated along lanes — the
    columns then line up with the window's WIN_ID feature rows, so one
    wide (T, WIN_ID) matmul replaces ROWS_ID serially-accumulated small
    ones (the 8-deep ``g = g + dot`` chain was the walk's critical
    path)."""
    return jnp.concatenate(
        [valid & (q == idblk[j][None, :]) for j in range(ROWS_ID)],
        axis=1)


def _idmatch_walk(q, valid, ids_ref, src_ref, carry_ref, k, Cin, dtype):
    """Walk id windows for one offset column; returns the gathered rows
    g (T, Cin) f32. q (T, 1) int32 query ids (-1 invalid)."""
    T = q.shape[0]
    Vp = src_ref.shape[1]
    n_win = Vp // WIN_ID
    qmax = jnp.max(jnp.where(valid, q, -1))
    start = jnp.minimum(carry_ref[k], n_win - 1)

    def cond(s):
        return jnp.logical_not(s[2])

    def body(s):
        win_i, _, _, g = s
        rbase = pl.multiple_of(win_i * ROWS_ID, 8)
        idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]       # (8, 128)
        fbase = pl.multiple_of(win_i * WIN_ID, 16)
        fwin = src_ref[0, pl.ds(fbase, WIN_ID), :]         # (WIN_ID, C)
        accept = _accept_block(q, valid, idblk)            # (T, WIN_ID)
        g = g + jax.lax.dot_general(
            accept.astype(src_ref.dtype), fwin,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        done = (jnp.max(idblk) >= qmax) | (win_i + 1 >= n_win)
        return win_i + 1, win_i, done, g

    init = (start, start, jnp.logical_not(jnp.any(valid)),
            jnp.zeros((T, Cin), jnp.float32))
    _, last, _, g = jax.lax.while_loop(cond, body, init)
    carry_ref[k] = last
    return g


def _kernel_idmatch(qids_ref, ids_ref, src_ref, w_ref, out_ref,
                    carry_ref, *, K):
    t = pl.program_id(1)
    T = qids_ref.shape[1]
    Cin = src_ref.shape[2]
    Cout = out_ref.shape[-1]

    @pl.when(t == 0)
    def _reset():
        for k in range(K):
            carry_ref[k] = 0

    acc = jnp.zeros((T, Cout), jnp.float32)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        g = _idmatch_walk(q, valid, ids_ref, src_ref, carry_ref, k, Cin,
                          src_ref.dtype)
        acc = acc + jax.lax.dot_general(
            g.astype(src_ref.dtype), w_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _rows_kernel_idmatch(qids_ref, ids_ref, src_ref, out_ref, carry_ref,
                         *, K):
    t = pl.program_id(1)
    Cin = src_ref.shape[2]

    @pl.when(t == 0)
    def _reset():
        for k in range(K):
            carry_ref[k] = 0

    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        g = _idmatch_walk(q, valid, ids_ref, src_ref, carry_ref, k, Cin,
                          src_ref.dtype)
        out_ref[0, :, k * Cin:(k + 1) * Cin] = g.astype(out_ref.dtype)


def idmatch_packed_fits(V: int, C: int,
                        budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Lane-packed id kernel: features cost Vp*256/R bytes (R = 128/Cp
    rows per VMEM row) + ids Vp*4 B."""
    Cp = _cpad(C)
    R = 128 // Cp
    Vp = max(-(-V // (WIN_ID * R)) * WIN_ID * R, WIN_ID * R)
    return Vp * 256 // R + Vp * 4 + TILE * 27 * 4 <= budget_bytes


def _idmatch_walk_packed(q, valid, ids_ref, src_ref, carry_ref, k, R, Cp,
                         dtype, condense, grp_iota):
    """Packed-feature variant of the id walk: features are lane-packed
    (R rows per 128-lane VMEM row); ids stay one-per-lane. The full
    (T, WIN_ID) accept mask is condensed to a packed-row one-hot by one
    constant block-sum matmul (``condense``, column c -> packed row
    c // R) and the matched lane group (= matched column mod R, <=1
    match per query over the whole walk) is accumulated as a masked
    reduction of ``grp_iota``. Returns g (T, Cp) f32 — each query's own
    channels."""
    T = q.shape[0]
    VpP = src_ref.shape[1]              # packed rows
    n_win = (VpP * R) // WIN_ID
    rows_per_win = WIN_ID // R          # packed rows per window
    qmax = jnp.max(jnp.where(valid, q, -1))
    start = jnp.minimum(carry_ref[k], n_win - 1)

    def cond(s):
        return jnp.logical_not(s[2])

    def body(s):
        win_i, _, _, g, grp_acc = s
        rbase = pl.multiple_of(win_i * ROWS_ID, 8)
        idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]      # (8, 128)
        pbase = pl.multiple_of(win_i * rows_per_win, 16)
        fwin = src_ref[0, pl.ds(pbase, rows_per_win), :]  # (.., R*Cp)
        accept = _accept_block(q, valid, idblk)           # (T, WIN_ID)
        onehot_p = jax.lax.dot_general(
            accept.astype(dtype), condense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        g = g + jax.lax.dot_general(
            onehot_p, fwin, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (T, R*Cp)
        grp_acc = grp_acc + jnp.sum(
            jnp.where(accept, grp_iota, 0), axis=1, keepdims=True)
        done = (jnp.max(idblk) >= qmax) | (win_i + 1 >= n_win)
        return win_i + 1, win_i, done, g, grp_acc

    init = (start, start, jnp.logical_not(jnp.any(valid)),
            jnp.zeros((T, R * Cp), jnp.float32),
            jnp.zeros((T, 1), jnp.int32))
    _, last, _, g, grp = jax.lax.while_loop(cond, body, init)
    carry_ref[k] = last
    # extract each query's own lane group
    out = jnp.zeros((T, Cp), jnp.float32)
    for r in range(R):
        out = jnp.where(grp == r, g[:, r * Cp:(r + 1) * Cp], out)
    return out


def _packed_walk_consts(T, R, Cp, dtype):
    """Loop-invariant constants for the packed id walk, built once per
    kernel invocation: the (WIN_ID, WIN_ID/R) block-sum condenser and
    the (T, WIN_ID) column-mod-R iota."""
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_ID, WIN_ID // R), 0)
    col = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_ID, WIN_ID // R), 1)
    condense = (lane // R == col).astype(dtype)
    grp_iota = jax.lax.broadcasted_iota(jnp.int32, (T, WIN_ID), 1) % R
    return condense, grp_iota


def _kernel_idmatch_packed(qids_ref, ids_ref, src_ref, w_ref, out_ref,
                           carry_ref, *, K, R, Cp):
    t = pl.program_id(1)
    T = qids_ref.shape[1]
    Cout = out_ref.shape[-1]

    @pl.when(t == 0)
    def _reset():
        for k in range(K):
            carry_ref[k] = 0

    condense, grp_iota = _packed_walk_consts(T, R, Cp, src_ref.dtype)
    acc = jnp.zeros((T, Cout), jnp.float32)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        g = _idmatch_walk_packed(q, valid, ids_ref, src_ref, carry_ref,
                                 k, R, Cp, src_ref.dtype, condense,
                                 grp_iota)
        acc = acc + jax.lax.dot_general(
            g.astype(src_ref.dtype), w_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _rows_kernel_idmatch_packed(qids_ref, ids_ref, src_ref, out_ref,
                                carry_ref, *, K, R, Cp):
    t = pl.program_id(1)
    T = qids_ref.shape[1]

    @pl.when(t == 0)
    def _reset():
        for k in range(K):
            carry_ref[k] = 0

    condense, grp_iota = _packed_walk_consts(T, R, Cp, src_ref.dtype)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        g = _idmatch_walk_packed(q, valid, ids_ref, src_ref, carry_ref,
                                 k, R, Cp, src_ref.dtype, condense,
                                 grp_iota)
        out_ref[0, :, k * Cp:(k + 1) * Cp] = g.astype(out_ref.dtype)


def _pack_idmatch_packed(features, site_ids, qids):
    """Lane-pack features (R rows per VMEM row); ids one-per-lane."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    dtype = features.dtype
    Cp = _cpad(C)
    R = 128 // Cp
    Vp = max(-(-V // (WIN_ID * R)) * WIN_ID * R, WIN_ID * R)
    feats = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    if Cp > C:
        feats = jnp.concatenate(
            [feats, jnp.zeros((B, Vp, Cp - C), dtype)], axis=2)
    packed = feats.reshape(B, Vp // R, R * Cp)
    ids = jnp.concatenate(
        [site_ids, jnp.full((B, Vp - V), jnp.iinfo(jnp.int32).max,
                            jnp.int32)], axis=1)
    ids_blk = ids.reshape(B, Vp // 128, 128)
    n_tiles = -(-Vout // TILE)
    qp = jnp.concatenate(
        [qids, jnp.full((B, n_tiles * TILE - Vout, K), -1, jnp.int32)],
        axis=1)
    return packed, ids_blk, qp, n_tiles, Vp, Cp, R


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raw_idmatch_packed(features, site_ids, qids, weights,
                        interpret=False):
    """Lane-packed id-matching conv for big-V stages (nuScenes 120k)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    packed, ids_blk, qp, n_tiles, Vp, Cp, R = _pack_idmatch_packed(
        features, site_ids, qids)
    w = weights
    if Cp > C:
        w = jnp.concatenate(
            [w, jnp.zeros((K, Cp - C, Cout), w.dtype)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // R, R * Cp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cp, Cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_idmatch_packed, K=K, R=R, Cp=Cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        interpret=interpret,
    )(qp, ids_blk, packed, w.astype(dtype))
    return out[:, :Vout]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_idmatch_packed(features, site_ids, qids, interpret=False):
    B, V, C = features.shape
    _, Vout, K = qids.shape
    dtype = features.dtype
    packed, ids_blk, qp, n_tiles, Vp, Cp, R = _pack_idmatch_packed(
        features, site_ids, qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // R, R * Cp), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * Cp),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_rows_kernel_idmatch_packed, K=K, R=R, Cp=Cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * Cp),
                                       dtype),
        interpret=interpret,
    )(qp, ids_blk, packed)
    out = out[:, :Vout]
    if Cp > C:
        out = out.reshape(B, Vout, K, Cp)[..., :C].reshape(
            B, Vout, K * C)
    return out


# ---------------------------------------------------------------------------
# Position matcher: the id walk emitting matched POSITIONS (the rulebook).
#
# Matching query ids against the sorted site-id list needs no feature
# table at all — resident VMEM is just the ids (Vp*4 B), so it fits at
# ANY stage size — and each pass is 8 VPU compares + one masked iota
# reduction (no MXU work). This replaces the XLA rulebook pipeline
# (dense position-table scatter + 27 scalar gathers per site,
# sparse_conv.py::build_position_table) which measured 40 ms at the
# nuScenes stage-1 shape; the resulting rulebook feeds the positional
# packed conv (2x faster per conv than the id-matching conv, so stages
# with >=2 convs amortize the matcher).
# ---------------------------------------------------------------------------


def _idmatch_walk_pos(q, valid, ids_ref, carry_ref, k, v_dummy):
    """Walk id windows for one offset column; returns (T, 1) matched
    positions in the site list (v_dummy on miss)."""
    T = q.shape[0]
    n_rows = ids_ref.shape[1]
    n_win = n_rows // ROWS_ID
    qmax = jnp.max(jnp.where(valid, q, -1))
    start = jnp.minimum(carry_ref[k], n_win - 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, WIN_ID), 1)

    def cond(s):
        return jnp.logical_not(s[2])

    def body(s):
        win_i, _, _, pos = s
        rbase = pl.multiple_of(win_i * ROWS_ID, 8)
        idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]       # (8, 128)
        accept = _accept_block(q, valid, idblk)            # (T, WIN_ID)
        # miss-encoded-as-(-1) max accumulator: a single (T, 1) int32
        # loop carry (a separate (T, 1) bool hit carry trips a Mosaic
        # internal error in scf.yield padded layouts)
        cand = jnp.max(
            jnp.where(accept, win_i * WIN_ID + col_iota, -1), axis=1,
            keepdims=True)
        pos = jnp.maximum(pos, cand)
        done = (jnp.max(idblk) >= qmax) | (win_i + 1 >= n_win)
        return win_i + 1, win_i, done, pos

    init = (start, start, jnp.logical_not(jnp.any(valid)),
            jnp.full((T, 1), -1, jnp.int32))
    _, last, _, pos = jax.lax.while_loop(cond, body, init)
    carry_ref[k] = last
    return jnp.where(pos >= 0, pos, v_dummy)


def _match_kernel(qids_ref, ids_ref, out_ref, carry_ref, *, K, v_dummy):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _reset():
        for k in range(K):
            carry_ref[k] = 0

    cols = []
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        cols.append(_idmatch_walk_pos(q, valid, ids_ref, carry_ref, k,
                                      v_dummy))
    out_ref[0] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("n_sites", "interpret"))
def match_positions(site_ids, qids, n_sites: int, interpret=False):
    """site_ids (B, V) sorted linear ids (INT_MAX = invalid row); qids
    (B, Vout, K) query linear ids (-1 = missing) -> (B, Vout, K) row
    positions into the site list, ``n_sites`` on miss — a drop-in
    rulebook for ``gather_conv_pallas`` / ``gather_conv``
    (sparse_conv.py::subm_neighbor_idx semantics).

    One window walk per offset. A z-plane-grouped variant (one shared
    walk per 9 offsets, SMEM min-id backoff for dense regions) measured
    SLOWER (31.3 vs 26.7 ms at V=120k, 11.5 vs 10.2 at 40k): the
    matcher is VPU-compare-bound, so grouping only moves the same
    element work around."""
    B, V = site_ids.shape
    _, Vout, K = qids.shape
    Vp = max(-(-V // WIN_ID) * WIN_ID, WIN_ID)
    ids = jnp.concatenate(
        [site_ids, jnp.full((B, Vp - V), jnp.iinfo(jnp.int32).max,
                            jnp.int32)], axis=1)
    ids_blk = ids.reshape(B, Vp // 128, 128)
    n_tiles = -(-Vout // TILE)
    qp = jnp.concatenate(
        [qids, jnp.full((B, n_tiles * TILE - Vout, K), -1, jnp.int32)],
        axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_match_kernel, K=K, v_dummy=n_sites),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K),
                                       jnp.int32),
        interpret=interpret,
    )(qp, ids_blk)
    return out[:, :Vout]


def _pack_idmatch(features, site_ids, qids):
    B, V, C = features.shape
    _, Vout, K = qids.shape
    Vp = max(-(-V // WIN_ID) * WIN_ID, WIN_ID)
    feats = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), features.dtype)], axis=1)
    ids = jnp.concatenate(
        [site_ids, jnp.full((B, Vp - V), jnp.iinfo(jnp.int32).max,
                            jnp.int32)], axis=1)
    ids_blk = ids.reshape(B, Vp // 128, 128)
    n_tiles = -(-Vout // TILE)
    qp = jnp.concatenate(
        [qids, jnp.full((B, n_tiles * TILE - Vout, K), -1, jnp.int32)],
        axis=1)
    return feats, ids_blk, qp, n_tiles, Vp


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raw_idmatch(features, site_ids, qids, weights, interpret=False):
    """features (B, V, C) sorted by linear id; site_ids (B, V) the ids
    (INT_MAX on invalid rows); qids (B, Vout, K) query ids (-1 =
    missing); weights (K, C, Cout). Returns (B, Vout, Cout)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    feats, ids_blk, qp, n_tiles, Vp = _pack_idmatch(features, site_ids,
                                                    qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_idmatch, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        interpret=interpret,
    )(qp, ids_blk, feats, weights.astype(dtype))
    return out[:, :Vout]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_idmatch(features, site_ids, qids, interpret=False):
    """Gathered rows (B, Vout, K*C) via id matching (dW path)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    dtype = features.dtype
    feats, ids_blk, qp, n_tiles, Vp = _pack_idmatch(features, site_ids,
                                                    qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((K,), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_rows_kernel_idmatch, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * C), dtype),
        interpret=interpret,
    )(qp, ids_blk, feats)
    return out[:, :Vout]


def _xla_idmatch_reference(features, site_ids, qids, weights):
    """XLA reference of the id-matching conv (goldens / CPU): converts
    ids to positions by searchsorted over the sorted site ids."""
    def one(f, ids, q):
        V, C = f.shape
        pos = jnp.searchsorted(ids, jnp.maximum(q, 0)).astype(jnp.int32)
        pos = jnp.clip(pos, 0, V - 1)
        hit = (q >= 0) & (ids[pos] == jnp.maximum(q, 0))
        idx = jnp.where(hit, pos, V)
        padded = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], 0)
        gathered = padded[idx]
        w = weights.reshape(-1, weights.shape[-1]).astype(f.dtype)
        Vout, K = q.shape
        return jax.lax.dot_general(
            gathered.reshape(Vout, K * C), w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(f.dtype)
    return jax.vmap(one)(features, site_ids, qids)


def _idmatch_conv(features, site_ids, qids, weights, interpret=False):
    """Dispatch: unpacked id kernel when the plain feature table fits
    VMEM, else the lane-packed variant (R=128/Cp rows per VMEM row)."""
    if idmatch_fits(features.shape[1]):
        return _raw_idmatch(features, site_ids, qids, weights,
                            interpret=interpret)
    return _raw_idmatch_packed(features, site_ids, qids, weights,
                               interpret=interpret)


def _idmatch_rows(features, site_ids, qids, interpret=False):
    if idmatch_fits(features.shape[1]):
        return _rows_idmatch(features, site_ids, qids,
                             interpret=interpret)
    return _rows_idmatch_packed(features, site_ids, qids,
                                interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gather_conv_ids(features, site_ids, qids, weights, bwd_qids, bwd_ids,
                    bwd_flip: bool = True):
    """Rulebook-free TPU sparse conv: neighbors found by matching query
    ids against the sorted site-id list inside the Pallas window walk.

    - submanifold: ``bwd_qids = qids``, ``bwd_ids = site_ids``,
      ``bwd_flip=True`` (symmetric relation + kernel-flipped transposed
      weights, same as the rulebook path);
    - strided: ``bwd_qids = strided_inverse_query_ids`` (OUTPUT-space
      ids per input), ``bwd_ids`` = the output site ids,
      ``bwd_flip=False``.
    """
    return _idmatch_conv(features, site_ids, qids, weights)


def _ids_fwd(features, site_ids, qids, weights, bwd_qids, bwd_ids,
             bwd_flip):
    out = _idmatch_conv(features, site_ids, qids, weights)
    return out, (features, site_ids, qids, weights, bwd_qids, bwd_ids)


def _ids_bwd(bwd_flip, res, g):
    features, site_ids, qids, weights, bwd_qids, bwd_ids = res
    K, C, Cout = weights.shape
    rows = _idmatch_rows(features, site_ids, qids)      # (B, Vout, K*C)
    dw = jnp.einsum("bvx,bvo->xo", rows.astype(jnp.float32),
                    g.astype(jnp.float32)).reshape(K, C, Cout)
    dw = dw.astype(weights.dtype)
    wseq = weights[::-1] if bwd_flip else weights
    wb = jnp.swapaxes(wseq, 1, 2)                       # (K, Cout, C)
    df = _idmatch_conv(g.astype(features.dtype), bwd_ids, bwd_qids, wb)
    return df.astype(features.dtype), None, None, dw, None, None


gather_conv_ids.defvjp(_ids_fwd, _ids_bwd)


def _gather_conv_pallas_raw(features, neighbor_idx, weights,
                            interpret: bool = False):
    """Dispatch: the unpacked kernel when the plain table fits VMEM
    (faster — no R-way lane-group selects; measured 107.5 vs 127.7
    ms/scene e2e on SUN RGB-D), else the lane-packed kernel whose table
    is R=128/C times smaller (nuScenes' 120k-voxel stages)."""
    if _unpacked_fits(features.shape[1]):
        return _raw_unpacked(features, neighbor_idx, weights,
                             interpret=interpret)
    return _raw_packed(features, neighbor_idx, weights,
                       interpret=interpret)


def gather_rows_pallas(features, neighbor_idx, interpret: bool = False):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    if _unpacked_fits(features.shape[1]):
        return _rows_unpacked(features, neighbor_idx,
                              interpret=interpret)
    return _rows_packed(features, neighbor_idx, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_conv_pallas(features, neighbor_idx, weights, bwd_idx,
                       bwd_flip: bool = True):
    """TPU sparse conv: forward via the windowed one-hot kernel.
    Batched: (B, V, C) x (B, Vout, K) -> (B, Vout, Cout).

    ``bwd_idx`` is the rulebook of the TRANSPOSED conv, used so
    d features is the same windowed gather-conv applied to the output
    cotangent (no XLA scatter anywhere):
    - submanifold: the relation is symmetric (n(v,k)=u iff n(u,K-1-k)=v),
      so pass ``bwd_idx = neighbor_idx`` with ``bwd_flip=True``
      (kernel-flipped transposed weights);
    - strided: pass ``strided_inverse_neighbor_idx`` (indices into the
      OUTPUT list) with ``bwd_flip=False``.
    d weights always contracts the Pallas-gathered rows against the
    cotangent."""
    return _gather_conv_pallas_raw(features, neighbor_idx, weights)


def _xla_gather_conv(features, neighbor_idx, weights):
    """Batched XLA reference formulation (goldens / CPU)."""
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


def _fwd(features, neighbor_idx, weights, bwd_idx, bwd_flip):
    # (this JAX passes nondiff args to fwd at their original positions,
    # and first to bwd)
    return _gather_conv_pallas_raw(features, neighbor_idx, weights), (
        features, neighbor_idx, weights, bwd_idx)


def _bwd(bwd_flip, res, g):
    features, neighbor_idx, weights, bwd_idx = res
    K, C, Cout = weights.shape
    # dW[k] = sum_{b,v} gathered[b,v,k,:]^T dout[b,v,:]
    rows = gather_rows_pallas(features, neighbor_idx)   # (B, Vout, K*C)
    dw = jnp.einsum("bvx,bvo->xo", rows.astype(jnp.float32),
                    g.astype(jnp.float32)).reshape(K, C, Cout)
    dw = dw.astype(weights.dtype)
    # dfeats via the transposed-conv rulebook on the same kernel
    wseq = weights[::-1] if bwd_flip else weights
    wb = jnp.swapaxes(wseq, 1, 2)                       # (K, Cout, C)
    df = _gather_conv_pallas_raw(g.astype(features.dtype), bwd_idx, wb)
    return df.astype(features.dtype), None, dw, None


gather_conv_pallas.defvjp(_fwd, _bwd)
