"""Composition-level torch-parity harness (VERDICT round-1 item 3).

The reference modules cannot be imported here (they require mmcv/mmdet3d
registries, absent from this image), so each test transplants ONE set of
randomly-initialized flax parameters into a torch oracle that re-expresses
the reference math directly from the cited code — torch's own kernels
(``F.grid_sample``, ``F.multi_head_attention_forward``, ``F.conv3d``,
``F.layer_norm``) exercise the conventions (align_corners, head packing,
cross-correlation, eps) that golden kernel tests alone cannot catch at the
composition level. Covered:

- sine positional embedding (uni3detr_transformer.py:34-65)
- full Uni3DETRHead eval forward: 4 query groups, 2 decoder layers with
  ref_point_head / query_scale / UniCrossAtten / iterative refinement,
  cls/reg/iou branches and pc_range decode (uni3detr_head.py:422-508,
  uni3detr_transformer.py:95-212,215-360)
- SparseEncoderHD vs a dense torch ``F.conv3d`` oracle (masked dense conv
  is mathematically identical to submanifold conv; strided site set via
  max-pooled occupancy — sparse_encoder_hd.py:70-214)
- NMSFreeCoder decode (nms_free_coder.py:57-123)
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from uni3detr_tpu.models.head import Uni3DETRHead
from uni3detr_tpu.models.layers import sine_pos_embed

ATOL = 2e-4


def t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def lin(x, p):
    """flax Dense params -> torch functional linear."""
    return F.linear(x, t(p["kernel"]).T, t(p["bias"]))


def layernorm(x, p, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def mlp3(x, p):
    """reference MLP(n_layers=3): Linear-ReLU x2 + Linear
    (uni3detr_transformer.py:18-31)."""
    x = F.relu(lin(x, p["Dense_0"]))
    x = F.relu(lin(x, p["Dense_1"]))
    return lin(x, p["Dense_2"])


def branch(x, p, layer_norm):
    """head branch (uni3detr_head.py:365-387): 2 x (Linear[+LN]+ReLU)
    + Linear."""
    for i in range(2):
        x = lin(x, p[f"Dense_{i}"])
        if layer_norm:
            x = layernorm(x, p[f"LayerNorm_{i}"])
        x = F.relu(x)
    return lin(x, p["Dense_2"])


def torch_sine_embed(pos, num_feats=128, temperature=10000.0):
    """reference get_sine_pos_embed (uni3detr_transformer.py:34-65)."""
    scale = 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_feats)
    parts = []
    for i in range(pos.shape[-1]):
        x = pos[..., i : i + 1] * scale / dim_t
        part = torch.stack((x[..., 0::2].sin(), x[..., 1::2].cos()),
                           dim=-1).flatten(-2)
        parts.append(part)
    return torch.cat(parts, dim=-1)


def mha(x_q, x_kv, p, num_heads):
    """flax MultiHeadDotProductAttention params -> torch MHA forward.

    q/k get the positional query added by the caller; v is the raw x
    (mmcv MultiheadAttention convention inside BaseTransformerLayer)."""
    C = x_kv.shape[-1]

    def w(name):
        return t(p[name]["kernel"]).reshape(C, C).T  # torch (out, in)

    def b(name):
        return t(p[name]["bias"]).reshape(C)

    in_w = torch.cat([w("query"), w("key"), w("value")], dim=0)
    in_b = torch.cat([b("query"), b("key"), b("value")], dim=0)
    out_w = t(p["out"]["kernel"]).reshape(C, C).T
    out_b = t(p["out"]["bias"])
    # (L, N, E) layout
    q = x_q.transpose(0, 1)
    kv = x_kv.transpose(0, 1)
    out, _ = F.multi_head_attention_forward(
        q, q, kv, C, num_heads, in_w, in_b, None, None, False, 0.0,
        out_w, out_b, training=False, need_weights=False)
    return out.transpose(0, 1)


def oracle_cross_attn(x, query_pos, ref, vol_t, p):
    """UniCrossAtten (uni3detr_transformer.py:215-360), num_points=1."""
    B, nq, C = x.shape
    q = x + query_pos
    attw = torch.sigmoid(lin(q, p["attention_weights"]))       # (B, nq, 1)
    grid = (torch.sigmoid(ref) - 0.5) * 2.0                    # (x, y, z)
    sampled = F.grid_sample(vol_t, grid.view(B, 1, 1, nq, 3),
                            align_corners=False)               # (B,C,1,1,nq)
    sampled = sampled[:, :, 0, 0].permute(0, 2, 1)             # (B, nq, C)
    out = lin(sampled * attw, p["output_proj"])
    pos = F.relu(layernorm(lin(ref, p["pos_enc0"]), p["LayerNorm_0"]))
    pos = F.relu(layernorm(lin(pos, p["pos_enc1"]), p["LayerNorm_1"]))
    return out + x + pos


def oracle_decoder_group(x, ref, vol_t, dec_p, reg_ps, num_layers,
                         num_heads):
    """One query group through the decoder stack
    (uni3detr_transformer.py:145-212): returns per-layer states and the
    reference ENTERING each layer (logit space)."""
    states, refs_in = [], []
    for lid in range(num_layers):
        sine = torch_sine_embed(torch.sigmoid(ref))
        raw_pos = mlp3(sine, dec_p["ref_point_head"])
        scale = mlp3(x, dec_p["query_scale"]) if lid > 0 else 1.0
        qp = scale * raw_pos
        lp = dec_p[f"layer{lid}"]
        # self_attn -> norm
        attn = mha(x + qp, x, lp["self_attn"], num_heads)
        x = layernorm(x + attn, lp["LayerNorm_0"])
        # cross_attn -> norm
        x = oracle_cross_attn(x, qp, ref, vol_t, lp["cross_attn"])
        x = layernorm(x, lp["LayerNorm_1"])
        # ffn -> norm
        y = lin(F.relu(lin(x, lp["Dense_0"])), lp["Dense_1"])
        x = layernorm(x + y, lp["LayerNorm_2"])
        states.append(x)
        refs_in.append(ref)
        tmp = branch(x, reg_ps[lid], layer_norm=False)
        new_ref = torch.cat([tmp[..., 0:2] + ref[..., 0:2],
                             tmp[..., 4:5] + ref[..., 2:3]], dim=-1)
        ref = new_ref.detach()
    return states, refs_in


def inverse_sigmoid_t(x, eps=1e-5):
    x = x.clamp(0, 1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def oracle_head(params, vol, fps, rnd, *, nq, num_layers, num_heads,
                pc_range):
    """Full eval-mode head forward (uni3detr_head.py:422-508)."""
    B = fps.shape[0]
    tgt = t(params["tgt_embed"])
    anchor = t(params["refpoint_embed"])
    C = tgt.shape[-1]
    vol_t = t(vol).permute(0, 4, 1, 2, 3)  # (B, C, D, H, W)
    contents = [tgt[:nq], tgt[nq:], tgt[nq:], tgt[nq:]]
    refs = [anchor.unsqueeze(0).expand(B, -1, -1),
            inverse_sigmoid_t(t(fps))[:, :nq],
            inverse_sigmoid_t(t(fps))[:, nq:],
            inverse_sigmoid_t(t(rnd))]
    reg_ps = [params[f"reg_branch{l}"] for l in range(num_layers)]
    g_states = []
    g_refs = []
    for g in range(4):
        x = contents[g].unsqueeze(0).expand(B, -1, -1)
        s, r = oracle_decoder_group(x, refs[g], vol_t, params["decoder"],
                                    reg_ps, num_layers, num_heads)
        g_states.append(s)
        g_refs.append(r)
    all_cls, all_box, all_iou = [], [], []
    for l in range(num_layers):
        h = torch.cat([g_states[g][l] for g in range(4)], dim=1)
        r = torch.cat([g_refs[g][l] for g in range(4)], dim=1)
        cls = branch(h, params[f"cls_branch{l}"], layer_norm=True)
        tmp = branch(h, params[f"reg_branch{l}"], layer_norm=False)
        iou = branch(h, params[f"iou_branch{l}"], layer_norm=False)[..., 0]
        xy = torch.sigmoid(tmp[..., 0:2] + r[..., 0:2])
        z = torch.sigmoid(tmp[..., 4:5] + r[..., 2:3])
        cx = xy[..., 0:1] * (pc_range[3] - pc_range[0]) + pc_range[0]
        cy = xy[..., 1:2] * (pc_range[4] - pc_range[1]) + pc_range[1]
        cz = z * (pc_range[5] - pc_range[2]) + pc_range[2]
        box = torch.cat([cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], dim=-1)
        all_cls.append(cls)
        all_box.append(box)
        all_iou.append(iou)
    return (torch.stack(all_cls), torch.stack(all_box),
            torch.stack(all_iou))


def test_sine_pos_embed_parity():
    rng = np.random.RandomState(0)
    pos = rng.rand(2, 7, 3).astype(np.float32)
    ours = np.asarray(sine_pos_embed(jnp.asarray(pos), num_feats=128))
    ref = torch_sine_embed(t(pos)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_head_full_forward_parity_torch():
    nq, L, C, H_, ncls, code = 4, 2, 32, 4, 5, 8
    pc = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    head = Uni3DETRHead(num_classes=ncls, num_query=nq, code_size=code,
                        embed_dim=C, num_decoder_layers=L, num_heads=H_,
                        ffn_dim=64, dropout=0.1, pc_range=pc)
    rng = np.random.RandomState(3)
    B = 2
    vol = rng.randn(B, 4, 5, 6, C).astype(np.float32)
    fps = rng.rand(B, 2 * nq, 3).astype(np.float32)
    rnd = rng.rand(B, nq, 3).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(vol),
                          jnp.asarray(fps), train=False,
                          random_points=jnp.asarray(rnd))
    # randomize (flax zero-inits several kernels; parity needs nonzero)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, jnp.float32) * 0.5
        for k, l in zip(keys, leaves)])

    outs = head.apply({"params": params}, jnp.asarray(vol),
                      jnp.asarray(fps), train=False,
                      random_points=jnp.asarray(rnd))
    p = jax.tree_util.tree_map(np.asarray, params)
    with torch.no_grad():
        cls_t, box_t, iou_t = oracle_head(
            p, vol, fps, rnd, nq=nq, num_layers=L, num_heads=H_,
            pc_range=pc)
    np.testing.assert_allclose(np.asarray(outs["all_cls_scores"]),
                               cls_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(outs["all_bbox_preds"]),
                               box_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(outs["all_iou_preds"]),
                               iou_t.numpy(), atol=ATOL)


def test_sparse_encoder_parity_torch_conv3d():
    """Masked dense torch conv3d == submanifold/strided sparse conv.

    Submanifold: inactive sites hold zero features, outputs are masked to
    the input site set. Strided SparseConv3d: output sites = any covered
    input site == 3x3x3/stride-2 max-pool of the occupancy mask
    (sparse_encoder_hd.py:140-214 semantics)."""
    from uni3detr_tpu.models.sparse_encoder import SparseEncoderHD
    from uni3detr_tpu.ops.voxelize import scatter_to_dense

    grid = (8, 10, 12)
    D, H_, W_ = grid
    V, Cin = 64, 4
    rng = np.random.RandomState(1)
    lin_ids = np.sort(rng.choice(D * H_ * W_, size=V, replace=False))
    coords = np.stack([lin_ids // (H_ * W_), (lin_ids // W_) % H_,
                       lin_ids % W_], -1).astype(np.int32)[None]
    feats = rng.randn(1, V, Cin).astype(np.float32)
    vmask = np.ones((1, V), bool)
    vmask[0, 60:] = False

    enc = SparseEncoderHD(
        sparse_shape=grid, base_channels=4, output_channels=16,
        encoder_channels=((4, 8), (8, 8)),
        downsample_paddings=((1, 1, 1),), budget_shrink=(8.0,),
        compute_dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(coords), jnp.asarray(vmask), False)
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(k, l.shape, jnp.float32) * 0.3
        for k, l in zip(keys, leaves)])
    variables = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
    volume, out_grid = enc.apply(variables, jnp.asarray(feats),
                                 jnp.asarray(coords), jnp.asarray(vmask),
                                 False)
    volume = np.asarray(volume)

    # ---- torch oracle ----
    def conv_w(p):
        k = np.asarray(p["kernel"])  # (27, Cin, Cout) row-major (z, y, x)
        return t(k.reshape(3, 3, 3, *k.shape[1:])).permute(4, 3, 0, 1, 2)

    def bn(x, p, mask):
        # eval mode, fresh stats: mean 0, var 1, eps 1e-3
        y = x / math.sqrt(1 + 1e-3)
        y = (y * t(np.asarray(p["scale"])).view(1, -1, 1, 1, 1)
             + t(np.asarray(p["bias"])).view(1, -1, 1, 1, 1))
        return y * mask

    dense = np.zeros((1, D, H_, W_, Cin), np.float32)
    m = torch.zeros((1, 1, D, H_, W_))
    for v in range(V):
        if vmask[0, v]:
            z, y, x = coords[0, v]
            dense[0, z, y, x] = feats[0, v]
            m[0, 0, z, y, x] = 1.0
    xd = t(dense).permute(0, 4, 1, 2, 3)

    # conv_input (subm + BN + ReLU, masked)
    x = F.conv3d(xd, conv_w(params["conv_input"]["_SpConv_0"]), padding=1)
    x = F.relu(bn(x, params["conv_input"]["MaskedBatchNorm_0"], m)) * m

    def basic_block(x, name, mask):
        blk = params[name]
        ident = x
        y = F.conv3d(x, conv_w(blk["_SpConv_0"]), padding=1)
        y = F.relu(bn(y, blk["MaskedBatchNorm_0"], mask)) * mask
        y = F.conv3d(y, conv_w(blk["_SpConv_1"]), padding=1)
        y = bn(y, blk["MaskedBatchNorm_1"], mask)
        return F.relu(y + ident) * mask

    x = basic_block(x, "stage1_block0", m)
    # strided downsample: output sites = covered inputs = max-pooled mask
    x = F.conv3d(x, conv_w(params["stage1_down"]), stride=2, padding=1)
    m2 = (F.max_pool3d(m, kernel_size=3, stride=2, padding=1) > 0).float()
    x = F.relu(bn(x, params["stage1_down_bn"], m2)) * m2
    x = basic_block(x, "stage2_block0", m2)
    x = basic_block(x, "stage2_block1", m2)
    # conv_out: 1x1x1 == per-voxel dense layer (no bias), BN, ReLU
    x = x.permute(0, 2, 3, 4, 1) @ t(np.asarray(params["conv_out"]["kernel"]))
    x = x / math.sqrt(1 + 1e-3)
    x = (x * t(np.asarray(params["conv_out_bn"]["scale"]))
         + t(np.asarray(params["conv_out_bn"]["bias"])))
    x = F.relu(x) * m2.permute(0, 2, 3, 4, 1)
    oracle = x.numpy()

    assert volume.shape == oracle.shape, (volume.shape, oracle.shape)
    np.testing.assert_allclose(volume, oracle, atol=3e-4)


def test_coder_decode_parity_torch():
    from uni3detr_tpu.train.coder import decode_predictions
    from uni3detr_tpu.models.config import Uni3DETRConfig

    cfg = Uni3DETRConfig(
        num_classes=4, code_size=8,
        pc_range=(-2.0, -2.0, -1.0, 2.0, 2.0, 1.0),
        voxel_size=(0.125, 0.125, 0.25), grid_size=(8, 32, 32),
        max_points_per_voxel=4, max_voxels=64, max_voxels_test=64,
        in_point_features=3, num_query=8, embed_dim=32,
        num_decoder_layers=3, num_heads=4, ffn_dim=64, max_gt=8,
        max_num=16, coder_alpha=0.3,
        post_center_range=(-3.0, -3.0, -2.0, 3.0, 3.0, 2.0))
    rng = np.random.RandomState(5)
    L, B, Q = 3, 2, 32
    outs = {
        "all_cls_scores": jnp.asarray(
            rng.randn(L, B, Q, 4).astype(np.float32)),
        "all_bbox_preds": jnp.asarray(np.concatenate([
            rng.uniform(-1.5, 1.5, (L, B, Q, 2)),
            rng.uniform(-1, 0.5, (L, B, Q, 2)),
            rng.uniform(-1, 1, (L, B, Q, 1)),
            rng.uniform(-1, 0.5, (L, B, Q, 1)),
            rng.uniform(-1, 1, (L, B, Q, 2))], -1).astype(np.float32)),
        "all_iou_preds": jnp.asarray(
            rng.randn(L, B, Q).astype(np.float32)),
    }
    boxes, scores, labels, valid = decode_predictions(outs, cfg)

    with torch.no_grad():
        cls = t(outs["all_cls_scores"])[1:].mean(0).sigmoid()
        box = t(outs["all_bbox_preds"])[1:].mean(0)
        iou = t(outs["all_iou_preds"])[1:].mean(0).sigmoid()
        for b in range(B):
            flat = cls[b].reshape(-1)
            top, idx = flat.topk(cfg.max_num)
            lab = idx % 4
            bidx = torch.div(idx, 4, rounding_mode="floor")
            code = box[b][bidx]
            # denormalize_bbox (core/bbox/util.py:44-80)
            rot = torch.atan2(code[:, 6], code[:, 7])
            yaw = -rot - math.pi / 2
            dec = torch.stack(
                [code[:, 0], code[:, 1], code[:, 4],
                 code[:, 2].exp(), code[:, 3].exp(), code[:, 5].exp(),
                 yaw], -1)
            score = (top ** cfg.coder_alpha
                     * iou[b][bidx] ** (1 - cfg.coder_alpha))
            pcr = torch.tensor(cfg.post_center_range)
            ok = ((dec[:, :3] >= pcr[:3]).all(-1)
                  & (dec[:, :3] <= pcr[3:]).all(-1))
            np.testing.assert_allclose(np.asarray(boxes[b]), dec.numpy(),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(scores[b]),
                                       score.numpy(), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(labels[b]),
                                          lab.numpy())
            np.testing.assert_array_equal(np.asarray(valid[b]),
                                          ok.numpy())
