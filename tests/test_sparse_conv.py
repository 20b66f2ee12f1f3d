"""Sparse conv rulebook + gather-GEMM vs dense torch conv3d oracle."""
import numpy as np
import jax.numpy as jnp

from uni3detr_tpu.ops.sparse_conv import (
    subm_neighbor_idx, gather_conv, downsample_sites, strided_neighbor_idx,
)

GRID = (6, 8, 10)


def _random_sites(rng, n, budget):
    """n unique sites in GRID, returned sorted by linear id + padded."""
    D, H, W = GRID
    lin = rng.choice(D * H * W, size=n, replace=False)
    lin = np.sort(lin)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], -1)
    pad = budget - n
    coords = np.concatenate(
        [coords, -np.ones((pad, 3), np.int64)]).astype(np.int32)
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    return coords, mask


def _dense_from_sparse(feats, coords, mask):
    dense = np.zeros(GRID + (feats.shape[-1],), np.float32)
    for f, c, m in zip(feats, coords, mask):
        if m:
            dense[c[0], c[1], c[2]] = f
    return dense


def _torch_conv(dense, w, stride, padding):
    import torch
    import torch.nn.functional as F
    x = torch.from_numpy(dense).permute(3, 0, 1, 2)[None]  # (1,C,D,H,W)
    # w layout: (K, Cin, Cout) with K row-major (z,y,x)
    K, Cin, Cout = w.shape
    k = round(K ** (1 / 3))
    wt = torch.from_numpy(
        w.reshape(k, k, k, Cin, Cout)).permute(4, 3, 0, 1, 2)
    out = F.conv3d(x, wt, stride=stride, padding=padding)
    return out[0].permute(1, 2, 3, 0).numpy()  # (D', H', W', Cout)


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    V = 64
    coords, mask = _random_sites(rng, 40, V)
    feats = rng.randn(V, 5).astype(np.float32) * mask[:, None]
    w = rng.randn(27, 5, 7).astype(np.float32) * 0.2
    idx = subm_neighbor_idx(jnp.asarray(coords), jnp.asarray(mask), GRID)
    out = np.asarray(gather_conv(jnp.asarray(feats), idx, jnp.asarray(w)))
    dense = _dense_from_sparse(feats, coords, mask)
    ref = _torch_conv(dense, w, 1, 1)
    for i in range(V):
        if mask[i]:
            np.testing.assert_allclose(
                out[i], ref[coords[i, 0], coords[i, 1], coords[i, 2]],
                rtol=1e-4, atol=1e-4)


def _oracle_out_sites(coords, mask, padding, stride=2, kernel=3):
    D, H, W = GRID
    og = tuple((g + 2 * p - kernel) // stride + 1
               for g, p in zip(GRID, padding))
    sites = set()
    for c, m in zip(coords, mask):
        if not m:
            continue
        for oz in range(og[0]):
            for oy in range(og[1]):
                for ox in range(og[2]):
                    o = (oz, oy, ox)
                    if all(o[a] * stride - padding[a] <= c[a]
                           <= o[a] * stride - padding[a] + kernel - 1
                           for a in range(3)):
                        sites.add(o)
    return sites, og


def test_downsample_sites_match_oracle():
    rng = np.random.RandomState(1)
    V = 64
    coords, mask = _random_sites(rng, 30, V)
    for padding in [(1, 1, 1), (0, 1, 1)]:
        oc, om, og = downsample_sites(
            jnp.asarray(coords), jnp.asarray(mask), GRID, padding, V)
        oc, om = np.asarray(oc), np.asarray(om)
        got = {tuple(oc[i]) for i in range(V) if om[i]}
        oracle, og_ref = _oracle_out_sites(coords, mask, padding)
        assert og == og_ref
        assert got == oracle, (padding, got ^ oracle)


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(2)
    V = 64
    coords, mask = _random_sites(rng, 30, V)
    feats = rng.randn(V, 4).astype(np.float32) * mask[:, None]
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.2
    padding = (0, 1, 1)
    oc, om, og = downsample_sites(
        jnp.asarray(coords), jnp.asarray(mask), GRID, padding, V)
    idx = strided_neighbor_idx(oc, om, jnp.asarray(coords),
                               jnp.asarray(mask), GRID, padding)
    out = np.asarray(gather_conv(jnp.asarray(feats), idx, jnp.asarray(w)))
    dense = _dense_from_sparse(feats, coords, mask)
    ref = _torch_conv(dense, w, 2, padding)
    oc_np, om_np = np.asarray(oc), np.asarray(om)
    assert ref.shape[:3] == og
    for i in range(V):
        if om_np[i]:
            np.testing.assert_allclose(
                out[i], ref[oc_np[i, 0], oc_np[i, 1], oc_np[i, 2]],
                rtol=1e-4, atol=1e-4)


def test_downsample_budget_truncates():
    rng = np.random.RandomState(3)
    coords, mask = _random_sites(rng, 50, 64)
    oc, om, og = downsample_sites(
        jnp.asarray(coords), jnp.asarray(mask), GRID, (1, 1, 1), 8)
    assert np.asarray(om).sum() <= 8


def test_downsample_sites_dense_matches_sort():
    """Dense maxpool+compaction route == candidate-sort route exactly
    (site set, ascending order, budget truncation, empty input)."""
    from uni3detr_tpu.ops.sparse_conv import downsample_sites_dense
    rng = np.random.RandomState(7)
    for n, budget, padding in [(30, 64, (1, 1, 1)), (30, 64, (0, 1, 1)),
                               (50, 12, (1, 1, 1)), (1, 8, (1, 0, 1)),
                               (0, 8, (1, 1, 1)), (60, 300, (1, 1, 1))]:
        coords, mask = _random_sites(rng, n, max(n, 4))
        a_oc, a_om, a_og = downsample_sites(
            jnp.asarray(coords), jnp.asarray(mask), GRID, padding, budget)
        b_oc, b_om, b_og = downsample_sites_dense(
            jnp.asarray(coords), jnp.asarray(mask), GRID, padding, budget)
        assert a_og == b_og
        np.testing.assert_array_equal(np.asarray(a_om), np.asarray(b_om))
        np.testing.assert_array_equal(
            np.asarray(a_oc)[np.asarray(a_om)],
            np.asarray(b_oc)[np.asarray(b_om)], err_msg=str((n, padding)))


def test_dense_impl_matches_gather_impl():
    """SparseEncoderHD(impl='dense') == impl='gather' at active sites with
    the SAME params (checkpoint-interchangeable by construction)."""
    import jax
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD

    rng = np.random.RandomState(3)
    grid = (16, 16, 16)
    V, n = 96, 70
    D, H, W = grid
    lin = np.sort(rng.choice(D * H * W, size=n, replace=False))
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], -1)
    coords = np.concatenate(
        [coords, -np.ones((V - n, 3), np.int64)]).astype(np.int32)
    mask = np.concatenate([np.ones(n, bool), np.zeros(V - n, bool)])
    feats = rng.randn(1, V, 4).astype(np.float32) * mask[None, :, None]

    kw = dict(sparse_shape=grid, base_channels=8, output_channels=16,
              encoder_channels=((8, 8), (8, 8), (8, 8), (8,)),
              downsample_paddings=((1, 1, 1), (1, 1, 1), (0, 1, 1)))
    enc_g = SparseEncoderHD(impl="gather", **kw)
    enc_d = SparseEncoderHD(impl="dense", **kw)
    args = (jnp.asarray(feats), jnp.asarray(coords)[None],
            jnp.asarray(mask)[None])
    vg = enc_g.init(jax.random.PRNGKey(0), *args, True)
    # identical param tree: dense variant initializes to the same names
    vd = enc_d.init(jax.random.PRNGKey(0), *args, True)
    assert (jax.tree_util.tree_structure(vg["params"])
            == jax.tree_util.tree_structure(vd["params"]))
    og, gg = enc_g.apply(vg, *args, False)
    od, gd = enc_d.apply(vd, *args, False)  # same init seed -> same params
    assert gg == gd
    og, od = np.asarray(og, np.float32), np.asarray(od, np.float32)
    assert og.shape == od.shape
    # dense == gather everywhere the gather path wrote (its site sets are
    # budget-capped subsets); both zero elsewhere except dense's extra
    # (legitimately covered) strided sites
    active = np.abs(og).sum(-1) > 0
    np.testing.assert_allclose(od[active], og[active], rtol=2e-2,
                               atol=2e-3)
    assert active.any()


def test_pallas_gather_conv_interpret():
    """Windowed one-hot Pallas kernel == XLA gather formulation
    (interpret mode on CPU), including dummy rows and window walking
    (spread indices)."""
    from uni3detr_tpu.ops.sparse_conv_pallas import (
        _gather_conv_pallas_raw, _xla_gather_conv)

    rng = np.random.RandomState(5)
    B, V, C, Cout, K = 2, 600, 8, 16, 27
    base = np.arange(V)
    idx = np.full((B, V, K), V, np.int32)
    idx[:, :, 13] = base
    nb = rng.rand(B, V, K) < 0.2
    raw = np.clip(base[None, :, None]
                  + rng.randint(-550, 550, (B, V, K)), 0, V - 1)
    idx = np.where(nb, raw, idx).astype(np.int32)
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    W = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.05)
    i = jnp.asarray(idx)
    ref = _xla_gather_conv(feats, i, W)
    out = _gather_conv_pallas_raw(feats, i, W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _interp_mocks(mod):
    """Route the custom-vjp internals through XLA/interpret for CPU."""
    import unittest.mock as mock
    real_rows = mod.gather_rows_pallas
    return (mock.patch.object(
                mod, "_gather_conv_pallas_raw",
                lambda f, n, w, interpret=False: mod._xla_gather_conv(
                    f, n, w)),
            mock.patch.object(
                mod, "gather_rows_pallas",
                lambda f, n, interpret=False: real_rows(
                    f, n, interpret=True)))


def test_pallas_gather_conv_symmetric_backward():
    """Submanifold backward: dfeats via the same kernel with
    kernel-flipped transposed weights equals autodiff of the XLA form,
    on a REAL subm rulebook."""
    import jax
    import uni3detr_tpu.ops.sparse_conv_pallas as mod

    rng = np.random.RandomState(7)
    grid = (6, 10, 12)
    D, H, W_ = grid
    n, V = 150, 160
    lin = np.sort(rng.choice(D * H * W_, size=n, replace=False))
    coords = np.stack([lin // (H * W_), (lin // W_) % H, lin % W_], -1)
    coords = np.concatenate(
        [coords, -np.ones((V - n, 3), np.int64)]).astype(np.int32)
    mask = np.concatenate([np.ones(n, bool), np.zeros(V - n, bool)])
    nb = np.asarray(subm_neighbor_idx(jnp.asarray(coords),
                                      jnp.asarray(mask), grid))
    C, Cout, K = 8, 16, 27
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32)
                        * mask[None, :, None])
    Wt = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.1)
    i = jnp.asarray(nb)[None]
    m1, m2 = _interp_mocks(mod)
    with m1, m2:
        g1 = jax.grad(lambda f, w: (mod.gather_conv_pallas(
            f, i, w, i, True) ** 2).sum(), argnums=(0, 1))(feats, Wt)
    g2 = jax.grad(lambda f, w: (mod._xla_gather_conv(f, i, w) ** 2
                                ).sum(), argnums=(0, 1))(feats, Wt)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_gather_conv_strided_backward():
    """Strided backward: dfeats via the inverse rulebook
    (strided_inverse_neighbor_idx, un-flipped transposed weights) equals
    autodiff of the XLA form on a REAL strided rulebook."""
    import jax
    import uni3detr_tpu.ops.sparse_conv_pallas as mod
    from uni3detr_tpu.ops.sparse_conv import strided_inverse_neighbor_idx

    rng = np.random.RandomState(8)
    V = 64
    coords, mask = _random_sites(rng, 40, V)
    padding = (0, 1, 1)
    oc, om, og = downsample_sites(
        jnp.asarray(coords), jnp.asarray(mask), GRID, padding, V)
    sidx = strided_neighbor_idx(oc, om, jnp.asarray(coords),
                                jnp.asarray(mask), GRID, padding)
    inv = strided_inverse_neighbor_idx(
        jnp.asarray(coords), jnp.asarray(mask), oc, om, og, padding)
    C, Cout, K = 4, 8, 27
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32)
                        * np.asarray(mask)[None, :, None])
    Wt = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.1)
    i = jnp.asarray(sidx)[None]
    iv = jnp.asarray(inv)[None]
    m1, m2 = _interp_mocks(mod)
    with m1, m2:
        g1 = jax.grad(lambda f, w: (mod.gather_conv_pallas(
            f, i, w, iv, False) ** 2).sum(), argnums=(0, 1))(feats, Wt)
    g2 = jax.grad(lambda f, w: (mod._xla_gather_conv(f, i, w) ** 2
                                ).sum(), argnums=(0, 1))(feats, Wt)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_gather_conv_packed_interpret():
    """Lane-packed kernel variant (big-V stages) == XLA formulation,
    including channel padding (C=5 -> Cp=8, R=16) and lane-group
    extraction."""
    from uni3detr_tpu.ops.sparse_conv_pallas import (_raw_packed,
                                                     _rows_packed,
                                                     _xla_gather_conv)
    rng = np.random.RandomState(9)
    B, V, C, Cout, K = 1, 700, 5, 16, 27
    base = np.arange(V)
    idx = np.full((B, V, K), V, np.int32)
    idx[:, :, 13] = base
    nb = rng.rand(B, V, K) < 0.3
    raw = np.clip(base[None, :, None]
                  + rng.randint(-650, 650, (B, V, K)), 0, V - 1)
    idx = np.where(nb, raw, idx).astype(np.int32)
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    W = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.05)
    i = jnp.asarray(idx)
    ref = _xla_gather_conv(feats, i, W)
    out = _raw_packed(feats, i, W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    rows = _rows_packed(feats, i, interpret=True)
    padded = jnp.concatenate([feats, jnp.zeros((B, 1, C))], axis=1)
    ref_rows = padded[0][idx[0]].reshape(1, V, K * C)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(ref_rows),
                               rtol=1e-6, atol=1e-6)


def _idmatch_fixture(rng, n=150, V=160, C=8, Cout=16):
    import jax
    from uni3detr_tpu.ops.sparse_conv import (linear_ids, subm_query_ids)
    coords, mask = _random_sites(rng, n, V)
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    ids = linear_ids(cj, mj, GRID)[None]
    qids = subm_query_ids(cj, mj, GRID)[None]
    nb = subm_neighbor_idx(cj, mj, GRID)[None]
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32)
                        * mask[None, :, None])
    Wt = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32) * 0.1)
    return ids, qids, nb, feats, Wt, cj, mj


def test_idmatch_conv_interpret_matches_positions():
    """Rulebook-free id-matching kernel == the positional XLA gather
    formulation (forward, submanifold)."""
    from uni3detr_tpu.ops.sparse_conv_pallas import (_raw_idmatch,
                                                     _xla_gather_conv)
    rng = np.random.RandomState(11)
    ids, qids, nb, feats, Wt, _, _ = _idmatch_fixture(rng)
    ref = _xla_gather_conv(feats, nb, Wt)
    out = _raw_idmatch(feats, ids, qids, Wt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_idmatch_conv_backward_subm():
    """gather_conv_ids autodiff == XLA positional autodiff (subm:
    symmetric relation, flipped weights)."""
    import jax
    import uni3detr_tpu.ops.sparse_conv_pallas as mod
    from unittest import mock

    rng = np.random.RandomState(12)
    ids, qids, nb, feats, Wt, _, _ = _idmatch_fixture(rng)
    orig_raw, orig_rows = mod._raw_idmatch, mod._rows_idmatch
    with mock.patch.object(
            mod, "_raw_idmatch",
            lambda f, i, q, w, interpret=False: orig_raw(
                f, i, q, w, interpret=True)), \
         mock.patch.object(
            mod, "_rows_idmatch",
            lambda f, i, q, interpret=False: orig_rows(
                f, i, q, interpret=True)):
        g1 = jax.grad(lambda f, w: (mod.gather_conv_ids(
            f, ids, qids, w, qids, ids, True) ** 2).sum(),
            argnums=(0, 1))(feats, Wt)
    g2 = jax.grad(lambda f, w: (mod._xla_gather_conv(f, nb, w) ** 2
                                ).sum(), argnums=(0, 1))(feats, Wt)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_idmatch_conv_strided_fwd_bwd():
    """Strided id-matching conv (+ inverse-query backward) == positional
    XLA formulation on a real downsampled site set."""
    import jax
    import uni3detr_tpu.ops.sparse_conv_pallas as mod
    from unittest import mock
    from uni3detr_tpu.ops.sparse_conv import (
        linear_ids, strided_query_ids, strided_inverse_query_ids)

    rng = np.random.RandomState(13)
    V = 64
    coords, mask = _random_sites(rng, 40, V)
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    padding = (0, 1, 1)
    oc, om, og = downsample_sites(cj, mj, GRID, padding, V)
    sidx = strided_neighbor_idx(oc, om, cj, mj, GRID, padding)[None]
    in_ids = linear_ids(cj, mj, GRID)[None]
    out_ids = linear_ids(oc, om, og)[None]
    sq = strided_query_ids(oc, om, GRID, padding)[None]
    invq = strided_inverse_query_ids(cj, mj, og, padding)[None]
    C, Cout = 4, 8
    feats = jnp.asarray(rng.randn(1, V, C).astype(np.float32)
                        * np.asarray(mask)[None, :, None])
    Wt = jnp.asarray(rng.randn(27, C, Cout).astype(np.float32) * 0.1)
    orig_raw, orig_rows = mod._raw_idmatch, mod._rows_idmatch
    with mock.patch.object(
            mod, "_raw_idmatch",
            lambda f, i, q, w, interpret=False: orig_raw(
                f, i, q, w, interpret=True)), \
         mock.patch.object(
            mod, "_rows_idmatch",
            lambda f, i, q, interpret=False: orig_rows(
                f, i, q, interpret=True)):
        out = mod.gather_conv_ids(feats, in_ids, sq, Wt, invq, out_ids,
                                  False)
        g1 = jax.grad(lambda f, w: (mod.gather_conv_ids(
            f, in_ids, sq, w, invq, out_ids, False) ** 2).sum(),
            argnums=(0, 1))(feats, Wt)
    ref = mod._xla_gather_conv(feats, sidx, Wt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    g2 = jax.grad(lambda f, w: (mod._xla_gather_conv(f, sidx, w) ** 2
                                ).sum(), argnums=(0, 1))(feats, Wt)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_idmatch_packed_interpret_matches_positions():
    """Lane-packed id-matching kernel (big-V stages) == XLA positional
    formulation, with channel padding (C=5 -> Cp=8, R=16) and
    lane-group extraction from the matched position."""
    from uni3detr_tpu.ops.sparse_conv_pallas import (
        _raw_idmatch_packed, _rows_idmatch_packed, _xla_gather_conv)
    rng = np.random.RandomState(21)
    C, Cout = 5, 16
    ids, qids, nb, feats, Wt, _, _ = _idmatch_fixture(
        rng, n=150, V=160, C=C, Cout=Cout)
    ref = _xla_gather_conv(feats, nb, Wt)
    out = _raw_idmatch_packed(feats, ids, qids, Wt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    rows = _rows_idmatch_packed(feats, ids, qids, interpret=True)
    # positional gathered-rows reference
    padded = jnp.concatenate(
        [feats[0], jnp.zeros((1, C), feats.dtype)], 0)
    rows_ref = padded[np.asarray(nb[0])].reshape(1, -1, 27 * C)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_ref),
                               rtol=1e-5, atol=1e-5)


def test_match_positions_interpret():
    """Pallas position matcher == the XLA position-table rulebook, for
    submanifold and strided query sets (incl. misses -> n_sites)."""
    from uni3detr_tpu.ops.sparse_conv import (
        linear_ids, strided_query_ids, strided_neighbor_idx,
        downsample_sites)
    from uni3detr_tpu.ops.sparse_conv_pallas import match_positions
    rng = np.random.RandomState(31)
    ids, qids, nb, _, _, cj, mj = _idmatch_fixture(rng, n=150, V=160)
    got = match_positions(ids, qids, 160, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(nb))
    # strided rulebook on the downsampled site set
    oc, om, og = downsample_sites(cj, mj, GRID, (1, 1, 1), 96)
    sq = strided_query_ids(oc, om, GRID, (1, 1, 1))[None]
    snb = strided_neighbor_idx(oc, om, cj, mj, GRID, (1, 1, 1))[None]
    got_s = match_positions(ids, sq[0][None], 160, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(snb))


def test_match_positions_dense_cluster():
    """Dense-slab stress: every cell occupied, so a 1024-id window
    spans only 1024 consecutive ids and each offset's matches crowd
    into few windows; the per-offset SMEM window carry must stay
    conservative across tile boundaries (W=1200 makes a -W-1 offset's
    query ids lag the site ids by more than a window)."""
    from uni3detr_tpu.ops.sparse_conv import (
        linear_ids, subm_query_ids, subm_neighbor_idx)
    from uni3detr_tpu.ops.sparse_conv_pallas import match_positions
    g = (3, 3, 1200)  # 10800 cells, fully occupied (>10 windows)
    D, H, W = g
    lin = np.arange(D * H * W, dtype=np.int64)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W],
                      -1).astype(np.int32)
    mask = np.ones(len(lin), bool)
    cj, mj = jnp.asarray(coords), jnp.asarray(mask)
    ids = linear_ids(cj, mj, g)[None]
    qids = subm_query_ids(cj, mj, g)[None]
    nb = subm_neighbor_idx(cj, mj, g)[None]
    got = match_positions(ids, qids, len(lin), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(nb))


def test_match_positions_count_vs_accept_block():
    """The counting (searchsorted) matcher kernel and the accept-block
    kernel are drop-in equivalents (match_positions(count=...)) —
    pinned explicitly so both stay covered whatever the
    UNI3DETR_MATCH_COUNT default; misses, -1 queries and dense slabs
    included."""
    from uni3detr_tpu.ops.sparse_conv_pallas import match_positions
    rng = np.random.RandomState(7)
    ids, qids, nb, _, _, _, _ = _idmatch_fixture(rng, n=150, V=160)
    qids = np.asarray(qids).copy()
    qids[0, ::5, 2] = -1                      # invalid queries
    qids = jnp.asarray(qids)
    a = match_positions(ids, qids, 160, interpret=True, count=False)
    b = match_positions(ids, qids, 160, interpret=True, count=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_conv_tile_win_variants_interpret():
    """Non-default tile/win parameters (the round-5 per-stage dispatch
    tuning) stay exact against the XLA formulation for BOTH positional
    kernels — padding, window starts and trip counts all depend on
    (tile, win)."""
    from uni3detr_tpu.ops.sparse_conv_pallas import (_raw_packed,
                                                     _raw_unpacked,
                                                     _xla_gather_conv)
    rng = np.random.RandomState(11)
    B, V, C, Cout, K = 1, 700, 8, 16, 27
    base = np.arange(V)
    idx = np.full((B, V, K), V, np.int32)
    idx[:, :, 13] = base
    nb = rng.rand(B, V, K) < 0.3
    raw = np.clip(base[None, :, None]
                  + rng.randint(-650, 650, (B, V, K)), 0, V - 1)
    idx = np.where(nb, raw, idx).astype(np.int32)
    feats = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    W = jnp.asarray(rng.randn(K, C, Cout).astype(np.float32) * 0.05)
    i = jnp.asarray(idx)
    ref = np.asarray(_xla_gather_conv(feats, i, W))
    for tile in (128, 256):
        out = _raw_packed(feats, i, W, interpret=True, tile=tile)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=1e-5, atol=1e-5, err_msg=f"packed tile={tile}")
    for tile, win in ((128, 128), (256, 128), (128, 256)):
        out = _raw_unpacked(feats, i, W, interpret=True, tile=tile,
                            win=win)
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=1e-5, atol=1e-5,
            err_msg=f"unpacked tile={tile} win={win}")
