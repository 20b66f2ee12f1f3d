"""Open-vocabulary CLIP-classifier head (Uni3DETRHeadCLIP equivalent).

Capability parity with the reference (uni3detr_head_clip.py:313-975):
- the cls branch outputs a 1024-d embedding (2x Linear+LN+ReLU, no final
  projection, ":379-389") matmul'd with frozen L2-normalized CLIP text
  embeddings loaded from a ``zeroshot_path`` .npy (":359-364,512-513");
- an extra per-class uncertainty branch (ncls+1 outputs, ":391-398") whose
  selected value weights the L1 loss by sqrt(2)*exp(-sigma) and adds a
  consistency term sigma.mean() (":696-697,733-734,748");
- camera-only mode (fpsbpts=None) uses only the nq learnable queries
  (":473-477").

The CLIP text embedding matrix is held in the ``constants`` variable
collection (frozen, not optimized).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geom.boxes import inverse_sigmoid
from .layers import BranchMLP
from .transformer import Uni3DETRDecoder


class _ClipClsBranch(nn.Module):
    clip_dim: int = 1024
    num_fcs: int = 2

    @nn.compact
    def __call__(self, x, zs_weights):
        for _ in range(self.num_fcs):
            x = nn.Dense(self.clip_dim)(x)
            x = nn.relu(nn.LayerNorm(epsilon=1e-5)(x))
        # zs_weights (ncls, clip_dim) L2-normalized rows
        return x @ zs_weights.T.astype(x.dtype)


class Uni3DETRHeadCLIP(nn.Module):
    num_classes: int
    num_query: int = 300
    code_size: int = 8
    embed_dim: int = 256
    num_decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1
    clip_dim: int = 1024
    pc_range: Tuple[float, ...] = (-3.2, -0.2, -2.0, 3.2, 6.2, 0.56)

    @nn.compact
    def __call__(self, volume, fpsbpts, train: bool = False,
                 random_points=None, zs_init=None):
        """volume (B, D, H, W, C); fpsbpts (B, 2*nq, 3) in [0,1] or None
        (camera-only). zs_init: optional (ncls, clip_dim) initial CLIP
        text embedding matrix (stored frozen in 'constants')."""
        B = volume.shape[0]
        nq, C = self.num_query, self.embed_dim
        L = self.num_decoder_layers

        def zs_initializer():
            if zs_init is not None:
                w = jnp.asarray(zs_init, jnp.float32)
            else:
                w = jax.random.normal(jax.random.PRNGKey(0),
                                      (self.num_classes, self.clip_dim))
            return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

        zs = self.variable("constants", "zs_weights", zs_initializer).value

        tgt_embed = self.param("tgt_embed", nn.initializers.normal(1.0),
                               (2 * nq, C))
        refpoint = self.param("refpoint_embed", nn.initializers.normal(1.0),
                              (nq, 3))
        learn_ref = jnp.broadcast_to(refpoint, (B, 1, nq, 3))
        shared = jnp.broadcast_to(tgt_embed[nq:], (B, 1, nq, C))
        contents = [jnp.broadcast_to(tgt_embed[:nq], (B, 1, nq, C))]
        refs = [learn_ref]
        if fpsbpts is not None:
            fps_ref = inverse_sigmoid(fpsbpts).reshape(B, 2, nq, 3)
            contents += [shared, shared]
            refs.append(fps_ref)
            if not train:
                assert random_points is not None
                contents.append(shared)
                refs.append(inverse_sigmoid(random_points)[:, None])
        query = jnp.concatenate(contents, axis=1)
        ref = jnp.concatenate(refs, axis=1)
        G = query.shape[1]

        cls_branches = [_ClipClsBranch(self.clip_dim, name=f"cls_branch{l}")
                        for l in range(L)]
        unc_branches = [
            BranchMLP(self.num_classes + 1, layer_norm=True,
                      name=f"uncertainty_branch{l}") for l in range(L)]
        reg_branches = [BranchMLP(self.code_size, name=f"reg_branch{l}")
                        for l in range(L)]
        iou_branches = [BranchMLP(1, name=f"iou_branch{l}")
                        for l in range(L)]

        decoder = Uni3DETRDecoder(
            num_layers=L, embed_dim=C, num_heads=self.num_heads,
            ffn_dim=self.ffn_dim, dropout=self.dropout, name="decoder")
        states, refs_in = decoder(query, ref, volume, reg_branches, train)

        pr = self.pc_range
        all_cls, all_box, all_iou, all_unc = [], [], [], []
        for l in range(L):
            h = states[l].reshape(B, G * nq, C)
            r = refs_in[l].reshape(B, G * nq, 3)
            cls = cls_branches[l](h, zs)
            unc = unc_branches[l](h)
            tmp = reg_branches[l](h)
            iou = iou_branches[l](h)[..., 0]
            xy = jax.nn.sigmoid(tmp[..., 0:2] + r[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + r[..., 2:3])
            cx = xy[..., 0:1] * (pr[3] - pr[0]) + pr[0]
            cy = xy[..., 1:2] * (pr[4] - pr[1]) + pr[1]
            cz = z * (pr[5] - pr[2]) + pr[2]
            box = jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1)
            all_cls.append(cls)
            all_box.append(box)
            all_iou.append(iou)
            all_unc.append(unc)

        return {
            "all_cls_scores": jnp.stack(all_cls).astype(jnp.float32),
            "all_bbox_preds": jnp.stack(all_box).astype(jnp.float32),
            "all_iou_preds": jnp.stack(all_iou).astype(jnp.float32),
            "all_uncertainty_preds": jnp.stack(all_unc).astype(jnp.float32),
        }
