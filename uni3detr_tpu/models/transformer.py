"""Grouped DAB-style decoder with 3D volume cross-attention.

Capability parity with the reference Uni3DETRTransformer(+Decoder) and
UniCrossAtten (uni3detr_transformer.py:68-360):
- per-layer sine embedding of the current reference point ->
  ``ref_point_head`` MLP positional query, scaled by ``query_scale(output)``
  for layers > 0;
- layer = self-attn / LN / cross-attn / LN / FFN / LN (post-norm);
- cross-attention samples the fused voxel volume trilinearly at the
  (sigmoided) reference points, weighted by a per-query learned sigmoid
  scalar, plus an MLP encoding of the raw reference (":339-360");
- iterative box refinement: ref_xy += reg[..., :2], ref_z += reg[..., 4:5]
  in logit space, detached (":194-202");
- query groups never cross-attend: the group axis folds into the batch
  axis (the reference loops over groups on host instead, ":111-127").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sample import grid_sample_3d
from .layers import MLP, sine_pos_embed


class UniCrossAtten(nn.Module):
    """Volume-sampling cross attention (uni3detr_transformer.py:215-360)."""
    embed_dim: int = 256
    num_points: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, query_pos, volume, ref_raw, train: bool):
        """x (B, G, nq, C); volume (B, D, H, W, C); ref_raw (B, G, nq, 3)
        in logit space."""
        if self.num_points != 1:
            # The reference samples ONE trilinear point per query and its
            # extra attention weights would be dead (every shipped config
            # sets num_points=1, uni3detr_sunrgbd.py:86). Sampling P>1
            # points is unimplemented here; reject loudly instead of
            # silently using attw[..., :1] only.
            raise NotImplementedError(
                "UniCrossAtten supports num_points=1 only (reference "
                "uni3detr_transformer.py:223-248 with num_points=1)")
        B, G, nq, C = x.shape
        q = x + query_pos
        attw = jax.nn.sigmoid(
            nn.Dense(self.num_points, kernel_init=nn.initializers.zeros,
                     name="attention_weights")(q))  # (B, G, nq, P)
        grid = jax.nn.sigmoid(ref_raw) * 2.0 - 1.0  # (x, y, z) in [-1, 1]
        sampled = grid_sample_3d(volume, grid.reshape(B, G * nq, 3))
        sampled = sampled.reshape(B, G, nq, C)
        out = nn.Dense(self.embed_dim, name="output_proj")(
            sampled * attw[..., :1])
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        pos = nn.Dense(self.embed_dim, name="pos_enc0")(ref_raw)
        pos = nn.relu(nn.LayerNorm(epsilon=1e-5)(pos))
        pos = nn.Dense(self.embed_dim, name="pos_enc1")(pos)
        pos = nn.relu(nn.LayerNorm(epsilon=1e-5)(pos))
        return out + x + pos


class DecoderLayer(nn.Module):
    """self_attn -> LN -> cross_attn -> LN -> FFN -> LN (post-norm),
    matching the reference BaseTransformerLayer operation_order
    (uni3detr_sunrgbd.py:100)."""
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, query_pos, volume, ref_raw, train: bool):
        B, G, nq, C = x.shape
        flat = lambda t: t.reshape(B * G, nq, -1)
        q = flat(x + query_pos)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            deterministic=not train, name="self_attn")(
                q, q, flat(x))
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = x + attn.reshape(B, G, nq, C)
        x = nn.LayerNorm(epsilon=1e-5)(x)

        x = UniCrossAtten(self.embed_dim, dropout=self.dropout,
                          name="cross_attn")(x, query_pos, volume, ref_raw,
                                             train)
        x = nn.LayerNorm(epsilon=1e-5)(x)

        y = nn.Dense(self.ffn_dim)(x)
        y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
        y = nn.Dense(self.embed_dim)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = nn.LayerNorm(epsilon=1e-5)(x + y)
        return x


class Uni3DETRDecoder(nn.Module):
    """Runs the layer stack with per-layer positional queries and box
    refinement. ``reg_branch_fns`` are the head's per-layer reg branches
    (shared between refinement and output decode, reference
    uni3detr_head.py:456-460)."""
    num_layers: int
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, ref, volume, reg_branch_fns, train: bool):
        """query (B, G, nq, C); ref (B, G, nq, 3) logit space.

        Returns (states [L x (B,G,nq,C)], refs_in [L x (B,G,nq,3)]).
        """
        ref_point_head = MLP(self.embed_dim, self.embed_dim, 3,
                             name="ref_point_head")
        query_scale = MLP(self.embed_dim, self.embed_dim, 3,
                          name="query_scale")
        x = query
        states, refs_in = [], []
        for l in range(self.num_layers):
            sine = sine_pos_embed(jax.nn.sigmoid(ref), num_feats=128)
            raw_pos = ref_point_head(sine)
            pos_scale = query_scale(x) if l > 0 else 1.0
            query_pos = pos_scale * raw_pos
            x = DecoderLayer(self.embed_dim, self.num_heads, self.ffn_dim,
                             self.dropout, name=f"layer{l}")(
                                 x, query_pos, volume, ref, train)
            states.append(x)
            refs_in.append(ref)
            tmp = reg_branch_fns[l](x)
            new_xy = tmp[..., 0:2] + ref[..., 0:2]
            new_z = tmp[..., 4:5] + ref[..., 2:3]
            ref = jax.lax.stop_gradient(
                jnp.concatenate([new_xy, new_z], axis=-1))
        return states, refs_in
