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
channels. A scalar-bounded ``fori_loop`` (trip counts precomputed from
each tile-offset's min/max neighbor row — no vector-reduce cond, no
per-pass scalar<->vector sync) walks the window forward so density
spikes cost extra passes instead of correctness; offsets with no valid
neighbor in a tile skip all vector work (measured faster in-model than
shared-walk or unconditional variants).

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

# All kernels here keep the (lane-padded) feature/id table VMEM-resident
# for the whole grid. With a batch axis in the grid, Mosaic DOUBLE-buffers
# the per-batch table block, so a table that fits the default 16 MiB
# scoped-vmem limit single-buffered OOMs at B=2 (seen: KITTI train bs2,
# stage-2 32.5k x C32 table = 8.3 MiB -> 16.13 MiB scoped). v5e/v5p have
# 128 MiB VMEM; raise the per-kernel limit so double-buffered tables at
# the 12 MiB dispatch budget (2x12 + scratch) always fit.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)


_WALK_GROUP = int(__import__("os").environ.get("UNI3DETR_WALK_GROUP", "9"))


def _group_size(K: int) -> int:
    """Offsets walked per window scan in the POSITIONAL kernels
    (UNI3DETR_WALK_GROUP; default 9 = one walk per dz-plane of a 3^3
    kernel). Grouping amortizes the per-pass fixed cost (window
    dynamic-slice + loop + scalar reads) across the group's offsets;
    trip bounds stay exact (per-group min/max). An earlier experiment
    "measured" grouping slower, but that harness relied on
    block_until_ready, which does not wait on the axon remote-TPU
    runtime — the honest e2e A/B (host-fetch bench.py,
    measurements/r5_conv_ab2.log) reads SUN RGB-D 30.18 ms/scene at
    GS=1, 27.59 at GS=3, 26.86 at GS=9."""
    return _WALK_GROUP if K % _WALK_GROUP == 0 else 1


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
    VpP = max(-(-(V + 1) // (16 * R)) * 16, WIN) + _win_rows(R)
    scratch = TILE * 27 * Cp * 2
    return VpP * 256 + scratch <= budget_bytes


def _select_group(g_packed, lane_grp, R, Cp):
    """(T, R*Cp) packed gather result -> (T, Cp) rows' own lane group."""
    g = jnp.zeros_like(g_packed[:, :Cp])
    for j in range(R):
        sel = lane_grp == j
        g = jnp.where(sel, g_packed[:, j * Cp:(j + 1) * Cp], g)
    return g


def _win_rows(R: int, tile: int | None = None) -> int:
    """Window rows per walk pass for packing factor R.

    A tile's T queries land on ~T/R consecutive packed rows
    (packed row = position // R), so a WIN-row window at R=8 computed an
    8x-too-wide one-hot matmul. Narrowing the window to the rows a tile
    can actually touch (plus boundary slack, rounded to the 128-lane MXU
    contraction) cut the positional packed conv 12.5 -> 4.5 ms at the
    nuScenes stage-1 shape (V=120k, C=16)."""
    tile = TILE if tile is None else tile
    return max(128, -(-(tile // R + 64) // 128) * 128)


def _walk(colps, w0, trips, src_ref, on_pass, win):
    """Window scan for a GROUP of offset columns: pass i covers the
    DISJOINT packed-row window [covered0 + i*win, covered0 + (i+1)*win)
    — the feature table is padded by one extra window of zero rows so no
    end-clamp is needed, the accept test collapses to a single compare
    (a dummy/invalid colp can only hit zero pad rows, adding 0), and the
    fori body carries no loop state, so Mosaic can pipeline passes.
    ``w0``/``trips`` are SMEM scalars precomputed in ``_pack_inputs`` /
    ``_row_info`` as exact bounds over the whole group (the per-pass
    fixed cost amortizes across the group's columns — see _group_size).
    Window starts are 16-aligned (bf16 sublane granularity for dynamic
    VMEM slices)."""
    T = colps[0].shape[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1)
    covered0 = (jnp.maximum(w0, 0) // 16) * 16

    def body(i, carry):
        base = pl.multiple_of(covered0 + i * win, 16)
        window = src_ref[0, pl.ds(base, win), :]   # (win, R*Cp)
        for j, colp in enumerate(colps):
            onehot = (colp - base == col_iota).astype(src_ref.dtype)
            g_packed = jax.lax.dot_general(
                onehot, window, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            on_pass(g_packed, j)
        return carry

    jax.lax.fori_loop(0, trips, body, 0)


def _kernel_packed(info_ref, idx_ref, src_ref, w_ref, out_ref, g_ref, *,
            K, v_dummy, R, Cp, NT, win):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    ids = idx_ref[0]               # (T, K) int32
    g_ref[:] = jnp.zeros_like(g_ref)
    GS = _group_size(K)
    base_i = (b * n_tiles + t) * (K // GS)
    for grp in range(K // GS):
        # dummy col = v_dummy maps to an all-zero pad row: matching it
        # adds 0, so no validity mask is needed anywhere
        cols = [ids[:, k:k + 1] for k in
                range(grp * GS, (grp + 1) * GS)]
        colps = [c // R for c in cols]
        lane_grps = [c % R for c in cols]

        def on_pass(g_packed, j, grp=grp, lane_grps=lane_grps):
            g = _select_group(g_packed, lane_grps[j], R, Cp)
            # exact: each accepted row sums exactly one bf16 value
            k = grp * GS + j
            g_ref[:, k * Cp:(k + 1) * Cp] += g.astype(g_ref.dtype)

        _walk(colps, info_ref[base_i + grp], info_ref[NT + base_i + grp],
              src_ref, on_pass, win)

    # one fused (T, K*Cp) @ (K*Cp, Cout) MXU matmul per tile
    out_ref[0] = jax.lax.dot_general(
        g_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pack_inputs(features, neighbor_idx, tile=None):
    """Lane-pack features; pad the rulebook to the tile grid."""
    tile = TILE if tile is None else tile
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    Cp = _cpad(C)
    R = 128 // Cp
    win = _win_rows(R, tile)
    # dummy row at index V; pad so packed rows are a multiple of 16 and
    # >= the walk window, plus ONE EXTRA WINDOW of zero rows so _walk's
    # disjoint windows never need an end clamp
    VpP = max(-(-(V + 1) // (16 * R)) * 16, win) + win
    Vp = VpP * R
    feats = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    if Cp > C:
        feats = jnp.concatenate(
            [feats, jnp.zeros((B, Vp, Cp - C), dtype)], axis=2)
    packed = feats.reshape(B, VpP, R * Cp)
    n_tiles = -(-Vout // tile)
    pad_rows = n_tiles * tile - Vout
    idx = jnp.concatenate(
        [neighbor_idx,
         jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)
    # per-(batch, tile, offset-GROUP) packed window start + pass count
    # (the kernels' fori_loop trip bound — see _walk / _group_size)
    GS = _group_size(K)
    tiled = idx.reshape(B, n_tiles, tile, K // GS, GS)
    big = jnp.where(tiled == V, jnp.iinfo(jnp.int32).max, tiled // R)
    starts = jnp.min(big, axis=(2, 4)).reshape(-1)
    starts = jnp.where(starts == jnp.iinfo(jnp.int32).max, 0, starts)
    ends = jnp.max(jnp.where(tiled == V, -1, tiled // R),
                   axis=(2, 4)).reshape(-1)
    covered0 = (starts // 16) * 16
    trips = jnp.where(ends >= 0,
                      (ends + 1 - covered0 + win - 1) // win, 0)
    info = jnp.concatenate([starts, trips])
    return packed, idx, info, n_tiles, Cp, R, VpP


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _raw_packed(features, neighbor_idx, weights,
                interpret: bool = False, tile: int | None = None):
    """features (B, V, C); neighbor_idx (B, Vout, K) with V = missing;
    weights (K, C, Cout). Returns (B, Vout, Cout). The batch folds into
    the kernel grid (one packed feature table resident per grid row)."""
    tile = TILE if tile is None else tile
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    packed, idx, info, n_tiles, Cp, R, VpP = _pack_inputs(
        features, neighbor_idx, tile)
    w = weights
    if Cp > C:
        w = jnp.concatenate(
            [w, jnp.zeros((K, Cp - C, Cout), w.dtype)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VpP, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * Cp, Cout), lambda b, t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, Cout), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, K * Cp), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_packed, K=K, v_dummy=V, R=R, Cp=Cp,
                          NT=B * n_tiles * (K // _group_size(K)),
                          win=_win_rows(R, tile)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, Cout), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, idx, packed, w.reshape(K * Cp, Cout).astype(dtype))
    return out[:, :Vout]


def _gather_rows_kernel_packed(info_ref, idx_ref, src_ref, out_ref, *, K,
                        v_dummy, R, Cp, NT, win):
    """Weights-free variant: materialize the gathered rows (T, K*Cp)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    ids = idx_ref[0]
    out_ref[0] = jnp.zeros_like(out_ref[0])
    GS = _group_size(K)
    base_i = (b * n_tiles + t) * (K // GS)
    for grp in range(K // GS):
        cols = [ids[:, k:k + 1] for k in
                range(grp * GS, (grp + 1) * GS)]
        colps = [c // R for c in cols]
        lane_grps = [c % R for c in cols]

        def on_pass(g_packed, j, grp=grp, lane_grps=lane_grps):
            g = _select_group(g_packed, lane_grps[j], R, Cp)
            k = grp * GS + j
            out_ref[0, :, k * Cp:(k + 1) * Cp] += g.astype(
                out_ref.dtype)

        _walk(colps, info_ref[base_i + grp], info_ref[NT + base_i + grp],
              src_ref, on_pass, win)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _rows_packed(features, neighbor_idx, interpret: bool = False,
                 tile: int | None = None):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    tile = TILE if tile is None else tile
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    packed, idx, info, n_tiles, Cp, R, VpP = _pack_inputs(
        features, neighbor_idx, tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VpP, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, K * Cp),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel_packed, K=K, v_dummy=V, R=R,
                          Cp=Cp, NT=B * n_tiles * (K // _group_size(K)),
                          win=_win_rows(R, tile)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, K * Cp),
                                       dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, idx, packed)
    out = out[:, :Vout]
    if Cp > C:
        out = out.reshape(B, Vout, K, Cp)[..., :C].reshape(
            B, Vout, K * C)
    return out




def _row_info(idx, V, B, n_tiles, K, tile=None, win=None):
    """Per-(batch, tile, offset-GROUP) raw-row window start + pass count
    for the unpacked kernels (win rows; see _pack_inputs for the
    packed-row analogue). Groups of _group_size(K) offsets share one
    window walk; bounds are exact mins/maxes over the group."""
    tile = TILE if tile is None else tile
    win = WIN if win is None else win
    GS = _group_size(K)
    tiled = idx.reshape(B, n_tiles, tile, K // GS, GS)
    big = jnp.where(tiled == V, jnp.iinfo(jnp.int32).max, tiled)
    starts = jnp.min(big, axis=(2, 4)).reshape(-1)   # (B*n_tiles*NG,)
    starts = jnp.where(starts == jnp.iinfo(jnp.int32).max, 0, starts)
    ends = jnp.max(jnp.where(tiled == V, -1, tiled),
                   axis=(2, 4)).reshape(-1)
    covered0 = (starts // 16) * 16
    trips = jnp.where(ends >= 0,
                      (ends + 1 - covered0 + win - 1) // win, 0)
    return jnp.concatenate([starts, trips])


def _kernel_unpacked(info_ref, idx_ref, src_ref, w_ref, out_ref, *, K,
                     v_dummy, NT, win):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    T = idx_ref.shape[1]
    Vp, C = src_ref.shape[1:]      # row v_dummy is the zero dummy
    Cout = out_ref.shape[-1]
    ids = idx_ref[0]               # (T, K) int32
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1)
    GS = _group_size(K)
    base_i = (b * n_tiles + t) * (K // GS)
    # disjoint windows (see _walk): a dummy col hits only the zero
    # dummy/pad rows, adding 0 — single-compare accept, no loop state
    acc = jnp.zeros((T, Cout), jnp.float32)
    for grp in range(K // GS):
        cols = [ids[:, k:k + 1] for k in
                range(grp * GS, (grp + 1) * GS)]   # GS x (T, 1)
        covered0 = (jnp.maximum(info_ref[base_i + grp], 0) // 16) * 16

        def body(i, a, cols=cols, covered0=covered0, grp=grp):
            base = pl.multiple_of(covered0 + i * win, 16)
            window = src_ref[0, pl.ds(base, win), :]   # (win, C)
            for j, col in enumerate(cols):
                onehot = (col - base == col_iota).astype(src_ref.dtype)
                g = jax.lax.dot_general(
                    onehot, window, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g = g.astype(src_ref.dtype)        # exact: one term/row
                a = a + jax.lax.dot_general(
                    g, w_ref[grp * GS + j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return a

        acc = jax.lax.fori_loop(0, info_ref[NT + base_i + grp], body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "win"))
def _raw_unpacked(features, neighbor_idx, weights,
                  interpret: bool = False, tile: int | None = None,
                  win: int | None = None):
    """features (B, V, C); neighbor_idx (B, Vout, K) with V = missing;
    weights (K, C, Cout). Returns (B, Vout, Cout). The batch folds into
    the kernel grid (one feature table resident per grid row)."""
    tile = TILE if tile is None else tile
    win = WIN if win is None else win
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    # dummy row at index V; then pad rows so Vp is a multiple of 16 and
    # >= win (keeps every clamped window start 16-aligned and in range)
    Vp = max(-(-(V + 1) // 16) * 16, win) + win
    padded = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    n_tiles = -(-Vout // tile)
    pad_rows = n_tiles * tile - Vout
    idx = jnp.concatenate(
        [neighbor_idx,
         jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)  # dummies
    info = _row_info(idx, V, B, n_tiles, K, tile, win)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda b, t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, Cout), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_unpacked, K=K, v_dummy=V,
                          NT=B * n_tiles * (K // _group_size(K)),
                          win=win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, Cout), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, idx, padded, weights.astype(dtype))
    return out[:, :Vout]


def _gather_rows_kernel_unpacked(info_ref, idx_ref, src_ref, out_ref, *,
                        K, v_dummy, NT, win):
    """Weights-free variant: materialize the gathered rows (T, K*C)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    T = idx_ref.shape[1]
    Vp, C = src_ref.shape[1:]
    ids = idx_ref[0]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, win), 1)
    out_ref[0] = jnp.zeros((T, K * C), out_ref.dtype)
    GS = _group_size(K)
    base_i = (b * n_tiles + t) * (K // GS)
    for grp in range(K // GS):
        cols = [ids[:, k:k + 1] for k in
                range(grp * GS, (grp + 1) * GS)]
        covered0 = (jnp.maximum(info_ref[base_i + grp], 0) // 16) * 16

        def body(i, carry, cols=cols, covered0=covered0, grp=grp):
            base = pl.multiple_of(covered0 + i * win, 16)
            window = src_ref[0, pl.ds(base, win), :]
            for j, col in enumerate(cols):
                k = grp * GS + j
                onehot = (col - base == col_iota).astype(src_ref.dtype)
                g = jax.lax.dot_general(
                    onehot, window, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, :, k * C:(k + 1) * C] += g.astype(
                    out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, info_ref[NT + base_i + grp], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "win"))
def _rows_unpacked(features, neighbor_idx, interpret: bool = False,
                   tile: int | None = None, win: int | None = None):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    tile = TILE if tile is None else tile
    win = WIN if win is None else win
    B, V, C = features.shape
    _, Vout, K = neighbor_idx.shape
    dtype = features.dtype
    Vp = max(-(-(V + 1) // 16) * 16, win) + win
    padded = jnp.concatenate(
        [features, jnp.zeros((B, Vp - V, C), dtype)], axis=1)
    n_tiles = -(-Vout // tile)
    pad_rows = n_tiles * tile - Vout
    idx = jnp.concatenate(
        [neighbor_idx, jnp.full((B, pad_rows, K), V, jnp.int32)], axis=1)
    info = _row_info(idx, V, B, n_tiles, K, tile, win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, K * C),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_gather_rows_kernel_unpacked, K=K, v_dummy=V,
                          NT=B * n_tiles * (K // _group_size(K)),
                          win=win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile, K * C), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, idx, padded)
    return out[:, :Vout]


def _unpacked_fits(V: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """The unpacked kernel's resident table costs Vp * 256 bytes (the
    (V, C) layout pads to 128 lanes under (8,128) tiling)."""
    Vp = max(-(-(V + 1) // 16) * 16, WIN) + WIN
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


def _id_window_trips(ids, qp, n_win):
    """Per-(batch, tile, offset) id-window coverage, precomputed in XLA.

    ids (B, Vp) sorted linear ids (INT_MAX pads), Vp % WIN_ID == 0;
    qp (B, n_tiles*TILE, K) query ids (-1 = missing). Window w holds the
    sorted ids at positions [w*WIN_ID, (w+1)*WIN_ID); every match for a
    tile's offset-k queries lies in the windows whose [first, last] id
    range intersects [min qid, max qid] — found here by two tiny
    broadcast compares against the window id bounds (n_win is ~V/1024).
    Returns ``info`` (2 * B*n_tiles*K,) int32 — first half window
    starts, second half trip counts — consumed from SMEM by scalar
    ``fori_loop``s in the kernels. This replaces the data-dependent
    ``while_loop`` walk whose per-pass vector-reduce cond (+ the qmax /
    idblk-max reduces and the scalar<->vector sync each pass) dominated
    the matcher and id-conv time at production shapes. The id kernels
    walk PER OFFSET (GS=1): grouping them was measured slower — see
    match_positions."""
    B, _ = ids.shape
    _, Vq, K = qp.shape
    GS, NG = 1, K
    n_tiles = Vq // TILE
    blk = ids.reshape(B, n_win, WIN_ID)
    wmin = blk[:, :, 0]                                  # (B, n_win)
    wmax = blk[:, :, -1]
    qt = qp.reshape(B, n_tiles, TILE, NG, GS)
    valid = qt >= 0
    big = jnp.iinfo(jnp.int32).max
    qmin = jnp.min(jnp.where(valid, qt, big),
                   axis=(2, 4))                          # (B, nt, NG)
    qmax = jnp.max(jnp.where(valid, qt, -1), axis=(2, 4))
    below = jnp.sum(wmax[:, None, :, None] < qmin[:, :, None, :],
                    axis=2, dtype=jnp.int32)             # (B, nt, NG)
    above = jnp.sum(wmin[:, None, :, None] > qmax[:, :, None, :],
                    axis=2, dtype=jnp.int32)
    win0 = jnp.minimum(below, n_win - 1)
    trips = jnp.maximum(n_win - above - below, 0)
    trips = jnp.where(jnp.any(valid, axis=(2, 4)), trips, 0)
    return jnp.concatenate([win0.reshape(-1), trips.reshape(-1)])


def _idmatch_pass(q, valid, ids_ref, src_ref, win_i):
    """ONE id-window pass for one offset column: gathered rows of the
    queries whose ids match window ``win_i``'s sorted ids, (T, C) f32.
    q (T, 1) int32 query ids (-1 invalid)."""
    rbase = pl.multiple_of(win_i * ROWS_ID, 8)
    idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]       # (8, 128)
    fbase = pl.multiple_of(win_i * WIN_ID, 16)
    fwin = src_ref[0, pl.ds(fbase, WIN_ID), :]         # (WIN_ID, C)
    accept = _accept_block(q, valid, idblk)            # (T, WIN_ID)
    return jax.lax.dot_general(
        accept.astype(src_ref.dtype), fwin,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _kernel_idmatch(info_ref, qids_ref, ids_ref, src_ref, w_ref, out_ref,
                    *, K, NT):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    T = qids_ref.shape[1]
    Cout = out_ref.shape[-1]
    acc = jnp.zeros((T, Cout), jnp.float32)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        win0 = info_ref[base + k]

        def body(i, g, q=q, valid=valid, win0=win0):
            return g + _idmatch_pass(q, valid, ids_ref, src_ref,
                                     win0 + i)

        g = jax.lax.fori_loop(0, info_ref[NT + base + k], body,
                              jnp.zeros((T, src_ref.shape[2]),
                                        jnp.float32))
        acc = acc + jax.lax.dot_general(
            g.astype(src_ref.dtype), w_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _rows_kernel_idmatch(info_ref, qids_ref, ids_ref, src_ref, out_ref,
                         *, K, NT):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    Cin = src_ref.shape[2]
    T = qids_ref.shape[1]
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        win0 = info_ref[base + k]

        def body(i, g, q=q, valid=valid, win0=win0):
            return g + _idmatch_pass(q, valid, ids_ref, src_ref,
                                     win0 + i)

        g = jax.lax.fori_loop(0, info_ref[NT + base + k], body,
                              jnp.zeros((T, Cin), jnp.float32))
        out_ref[0, :, k * Cin:(k + 1) * Cin] = g.astype(out_ref.dtype)


def idmatch_packed_fits(V: int, C: int,
                        budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Lane-packed id kernel: features cost Vp*256/R bytes (R = 128/Cp
    rows per VMEM row) + ids Vp*4 B."""
    Cp = _cpad(C)
    R = 128 // Cp
    Vp = max(-(-V // (WIN_ID * R)) * WIN_ID * R, WIN_ID * R)
    return Vp * 256 // R + Vp * 4 + TILE * 27 * 4 <= budget_bytes


def _idmatch_pass_packed(q, valid, ids_ref, src_ref, win_i, R, Cp,
                         dtype, condense, grp_iota):
    """ONE id-window pass, packed-feature variant: features are
    lane-packed (R rows per 128-lane VMEM row); ids stay one-per-lane.
    The full (T, WIN_ID) accept mask is condensed to a packed-row
    one-hot by one constant block-sum matmul (``condense``, column c ->
    packed row c // R) and the matched lane group (= matched column mod
    R, <=1 match per query over the whole walk) comes from a masked
    reduction of ``grp_iota``. Returns (g (T, R*Cp) f32, grp (T, 1))."""
    rows_per_win = WIN_ID // R          # packed rows per window
    rbase = pl.multiple_of(win_i * ROWS_ID, 8)
    idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]      # (8, 128)
    pbase = pl.multiple_of(win_i * rows_per_win, 16)
    fwin = src_ref[0, pl.ds(pbase, rows_per_win), :]  # (.., R*Cp)
    accept = _accept_block(q, valid, idblk)           # (T, WIN_ID)
    onehot_p = jax.lax.dot_general(
        accept.astype(dtype), condense, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    g = jax.lax.dot_general(
        onehot_p, fwin, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (T, R*Cp)
    grp = jnp.sum(jnp.where(accept, grp_iota, 0), axis=1, keepdims=True)
    return g, grp


def _extract_grp(g, grp, R, Cp):
    """(T, R*Cp) packed gather + (T, 1) matched lane group -> (T, Cp)
    each query's own channels (unmatched rows are all-zero in g, so any
    group reads 0)."""
    out = jnp.zeros((g.shape[0], Cp), jnp.float32)
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


def _kernel_idmatch_packed(info_ref, qids_ref, ids_ref, src_ref, w_ref,
                           out_ref, *, K, R, Cp, NT):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    T = qids_ref.shape[1]
    Cout = out_ref.shape[-1]
    condense, grp_iota = _packed_walk_consts(T, R, Cp, src_ref.dtype)
    acc = jnp.zeros((T, Cout), jnp.float32)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        win0 = info_ref[base + k]

        def body(i, s, q=q, valid=valid, win0=win0):
            g, grp = s
            g1, grp1 = _idmatch_pass_packed(
                q, valid, ids_ref, src_ref, win0 + i, R, Cp,
                src_ref.dtype, condense, grp_iota)
            return g + g1, grp + grp1

        g, grp = jax.lax.fori_loop(
            0, info_ref[NT + base + k], body,
            (jnp.zeros((T, R * Cp), jnp.float32),
             jnp.zeros((T, 1), jnp.int32)))
        acc = acc + jax.lax.dot_general(
            _extract_grp(g, grp, R, Cp).astype(src_ref.dtype), w_ref[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _rows_kernel_idmatch_packed(info_ref, qids_ref, ids_ref, src_ref,
                                out_ref, *, K, R, Cp, NT):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    T = qids_ref.shape[1]
    condense, grp_iota = _packed_walk_consts(T, R, Cp, src_ref.dtype)
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        win0 = info_ref[base + k]

        def body(i, s, q=q, valid=valid, win0=win0):
            g, grp = s
            g1, grp1 = _idmatch_pass_packed(
                q, valid, ids_ref, src_ref, win0 + i, R, Cp,
                src_ref.dtype, condense, grp_iota)
            return g + g1, grp + grp1

        g, grp = jax.lax.fori_loop(
            0, info_ref[NT + base + k], body,
            (jnp.zeros((T, R * Cp), jnp.float32),
             jnp.zeros((T, 1), jnp.int32)))
        out_ref[0, :, k * Cp:(k + 1) * Cp] = _extract_grp(
            g, grp, R, Cp).astype(out_ref.dtype)


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
    info = _id_window_trips(ids, qp, Vp // WIN_ID)
    return packed, ids_blk, qp, info, n_tiles, Vp, Cp, R


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raw_idmatch_packed(features, site_ids, qids, weights,
                        interpret=False):
    """Lane-packed id-matching conv for big-V stages (nuScenes 120k)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    packed, ids_blk, qp, info, n_tiles, Vp, Cp, R = _pack_idmatch_packed(
        features, site_ids, qids)
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
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // R, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Cp, Cout), lambda b, t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_idmatch_packed, K=K, R=R, Cp=Cp,
                          NT=B * n_tiles * K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, qp, ids_blk, packed, w.astype(dtype))
    return out[:, :Vout]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_idmatch_packed(features, site_ids, qids, interpret=False):
    B, V, C = features.shape
    _, Vout, K = qids.shape
    dtype = features.dtype
    packed, ids_blk, qp, info, n_tiles, Vp, Cp, R = _pack_idmatch_packed(
        features, site_ids, qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // R, R * Cp), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * Cp),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_rows_kernel_idmatch_packed, K=K, R=R, Cp=Cp,
                          NT=B * n_tiles * K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * Cp),
                                       dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, qp, ids_blk, packed)
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


def _match_pass(q, valid, ids_ref, win_i, col_iota):
    """ONE id-window pass: (T, 1) matched positions in window ``win_i``
    (-1 = no match in this window); miss-encoded-as-(-1) max
    accumulator (a separate (T, 1) bool hit carry trips a Mosaic
    internal error in scf.yield padded layouts)."""
    rbase = pl.multiple_of(win_i * ROWS_ID, 8)
    idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]       # (8, 128)
    accept = _accept_block(q, valid, idblk)            # (T, WIN_ID)
    return jnp.max(
        jnp.where(accept, win_i * WIN_ID + col_iota, -1), axis=1,
        keepdims=True)


def _match_kernel(info_ref, qids_ref, ids_ref, out_ref, *, K, v_dummy,
                  NT):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    T = qids_ref.shape[1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (T, WIN_ID), 1)
    cols = []
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        valid = q >= 0
        win0 = info_ref[base + k]

        def body(i, pos, q=q, valid=valid, win0=win0):
            return jnp.maximum(pos, _match_pass(q, valid, ids_ref,
                                                win0 + i, col_iota))

        pos = jax.lax.fori_loop(0, info_ref[NT + base + k], body,
                                jnp.full((T, 1), -1, jnp.int32))
        cols.append(jnp.where(pos >= 0, pos, v_dummy))
    out_ref[0] = jnp.concatenate(cols, axis=1)


def _match_kernel_count(info_ref, qids_ref, ids_ref, out_ref, *, K,
                        v_dummy, NT):
    """Counting (searchsorted) formulation of the matcher: the position
    of query id q in the sorted site list is

        pos = win0 * WIN_ID + #{walked ids < q}

    (ids in windows before win0 are all < every valid q of the tile by
    _id_window_trips' bound), and q is PRESENT iff #{ids <= q} exceeds
    #{ids < q}. Each pass is 2x8 narrow (T, 128) compares accumulated
    in-register and two lane reductions — no (T, WIN_ID) lane-concat,
    no wide where/max (the relayout-heavy part of _accept_block).
    Counts are exact in f32 (< 2^24). Unique site ids guaranteed by
    construction (one id per voxel)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    base = (b * n_tiles + t) * K
    T = qids_ref.shape[1]
    cols = []
    for k in range(K):
        q = qids_ref[0, :, k:k + 1]
        win0 = info_ref[base + k]

        def body(i, carry, q=q, win0=win0):
            lt, le = carry
            rbase = pl.multiple_of((win0 + i) * ROWS_ID, 8)
            idblk = ids_ref[0, pl.ds(rbase, ROWS_ID), :]   # (8, 128)
            alt = jnp.zeros((T, 128), jnp.float32)
            ale = jnp.zeros((T, 128), jnp.float32)
            for j in range(ROWS_ID):
                row = idblk[j][None, :]
                alt = alt + (row < q).astype(jnp.float32)
                ale = ale + (row <= q).astype(jnp.float32)
            return (lt + jnp.sum(alt, axis=1, keepdims=True),
                    le + jnp.sum(ale, axis=1, keepdims=True))

        z = jnp.zeros((T, 1), jnp.float32)
        lt, le = jax.lax.fori_loop(0, info_ref[NT + base + k], body,
                                   (z, z))
        pos = win0 * WIN_ID + lt.astype(jnp.int32)
        cols.append(jnp.where(le - lt > 0.5, pos, v_dummy))
    out_ref[0] = jnp.concatenate(cols, axis=1)


_MATCH_COUNT = __import__("os").environ.get(
    "UNI3DETR_MATCH_COUNT", "1") == "1"


@functools.partial(jax.jit,
                   static_argnames=("n_sites", "interpret", "count"))
def match_positions(site_ids, qids, n_sites: int, interpret=False,
                    count=None):
    """site_ids (B, V) sorted linear ids (INT_MAX = invalid row); qids
    (B, Vout, K) query linear ids (-1 = missing) -> (B, Vout, K) row
    positions into the site list, ``n_sites`` on miss — a drop-in
    rulebook for ``gather_conv_pallas`` / ``gather_conv``
    (sparse_conv.py::subm_neighbor_idx semantics).

    One scalar-bounded window scan per offset, trip counts precomputed
    by ``_id_window_trips``. Two variants (``count``, default from
    UNI3DETR_MATCH_COUNT=1): the COUNTING kernel (searchsorted — see
    _match_kernel_count) avoids the accept-block's (T, WIN_ID)
    lane-concat relayout and wide where/max and measured 2x faster on a
    v5e (id build + matcher at V=40k C=16: 8.88 -> 4.49 ms; the matcher
    alone ~7.7 -> ~3.1 ms). A z-plane-grouped accept-block variant (one
    shared walk per 9 offsets, SMEM min-id backoff for dense regions)
    measured SLOWER (31.3 vs 26.7 ms at V=120k, 11.5 vs 10.2 at 40k):
    the matcher is VPU-compare-bound, so grouping only moves the same
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
    info = _id_window_trips(ids, qp, Vp // WIN_ID)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    if count is None:
        count = _MATCH_COUNT
    kern = _match_kernel_count if count else _match_kernel
    out = pl.pallas_call(
        functools.partial(kern, K=K, v_dummy=n_sites,
                          NT=B * n_tiles * K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K),
                                       jnp.int32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, qp, ids_blk)
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
    info = _id_window_trips(ids, qp, Vp // WIN_ID)
    return feats, ids_blk, qp, info, n_tiles, Vp


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raw_idmatch(features, site_ids, qids, weights, interpret=False):
    """features (B, V, C) sorted by linear id; site_ids (B, V) the ids
    (INT_MAX on invalid rows); qids (B, Vout, K) query ids (-1 =
    missing); weights (K, C, Cout). Returns (B, Vout, Cout)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    Cout = weights.shape[-1]
    dtype = features.dtype
    feats, ids_blk, qp, info, n_tiles, Vp = _pack_idmatch(
        features, site_ids, qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Cout), lambda b, t, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, Cout),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_idmatch, K=K, NT=B * n_tiles * K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, Cout), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, qp, ids_blk, feats, weights.astype(dtype))
    return out[:, :Vout]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_idmatch(features, site_ids, qids, interpret=False):
    """Gathered rows (B, Vout, K*C) via id matching (dW path)."""
    B, V, C = features.shape
    _, Vout, K = qids.shape
    dtype = features.dtype
    feats, ids_blk, qp, info, n_tiles, Vp = _pack_idmatch(
        features, site_ids, qids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE, K), lambda b, t, s: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp // 128, 128), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, K * C),
                               lambda b, t, s: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_rows_kernel_idmatch, K=K, NT=B * n_tiles * K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, K * C), dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(info, qp, ids_blk, feats)
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


_KERNEL_OVERRIDE = __import__("os").environ.get("UNI3DETR_CONV_KERNEL", "")


def _conv_tile(C: int, V: int | None = None) -> int:
    """Production tile for the lane-packed positional kernels.

    Honest host-fetch tile sweeps with clustered ids
    (measurements/r5_tpu_part3.log + r5_final.log, TPU v5e): packed
    T=256 wins at C=16 for small-V stages (1.16 ms vs 3.58 @T=512 at
    V=40k) — R=8 keeps the walk window at the 128-lane floor so T=256
    halves the one-hot area; at the nuScenes V=120k scale the pass
    count dominates instead and T=512 wins (10.40 vs 11.84 @256,
    14.41 @1024). T=512 at C>=32 (1.46 vs 2.12 at V=28k/C32).
    """
    if _cpad(C) <= 16:
        return 256 if (V is None or V <= 65536) else 512
    if V is not None and V > 65536:
        return 1024  # 5.02 vs 5.59 @512 at V=108k/C32
    return 512


def _unpacked_tile(C: int):
    """(tile, win) for the unpacked kernel at GS=9: T=256/W=512 at C=16
    measured 1.406 ms vs 1.863 for the T=W=512 default at the SUN RGB-D
    stage-1 shape (V=40k, honest harness, tools/measure_unpacked_win.py);
    C>=32 keeps the default (unswept)."""
    if _cpad(C) <= 16:
        return 256, 512
    return None, None


def _gather_conv_pallas_raw(features, neighbor_idx, weights,
                            interpret: bool = False):
    """Dispatch: the unpacked kernel when the plain table fits VMEM,
    else the lane-packed kernel (table R=128/C times smaller — the
    nuScenes 120k-voxel stages) at the swept tile (_conv_tile).

    The packed kernel won the ISOLATED honest tile sweep at every
    SUN RGB-D stage shape (measurements/r5_tpu_part3.log), but
    switching the in-model dispatch to it measured 51.6 ms/scene e2e
    vs 30.2 unpacked (measurements/r5_conv_ab.log) — the e2e program
    is the decider, so unpacked stays wherever it fits.
    ``UNI3DETR_CONV_KERNEL=packed`` forces the packed kernel for A/Bs."""
    if _KERNEL_OVERRIDE != "packed" and _unpacked_fits(
            features.shape[1]):
        t, wn = _unpacked_tile(features.shape[2])
        return _raw_unpacked(features, neighbor_idx, weights,
                             interpret=interpret, tile=t, win=wn)
    return _raw_packed(features, neighbor_idx, weights,
                       interpret=interpret,
                       tile=_conv_tile(features.shape[2], features.shape[1]))


def gather_rows_pallas(features, neighbor_idx, interpret: bool = False):
    """(B, V, C) x (B, Vout, K) -> gathered rows (B, Vout, K*C)."""
    if _KERNEL_OVERRIDE != "packed" and _unpacked_fits(
            features.shape[1]):
        return _rows_unpacked(features, neighbor_idx,
                              interpret=interpret)
    return _rows_packed(features, neighbor_idx, interpret=interpret,
                        tile=_conv_tile(features.shape[2], features.shape[1]))


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
