"""Jitted train / eval steps with GSPMD sharding.

The reference training loop is mmcv's EpochBasedRunner + DDP with NCCL
allreduce and host-side Hungarian (SURVEY.md §3.1). Here one jit'd program
per step does: forward (bf16 compute) -> on-device matching -> losses ->
grads -> global-norm clip -> AdamW, with the batch sharded over the mesh
'data' axis; XLA inserts the gradient/statistic collectives (the psum
equivalents of DDP allreduce + reduce_mean).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..models.config import Uni3DETRConfig, OVUni3DETRConfig
from ..models.detector import Uni3DETR
from .coder import decode_predictions, post_process
from .losses import uni3detr_loss


def build_model(cfg: Uni3DETRConfig, zs_init=None):
    if isinstance(cfg, OVUni3DETRConfig):
        from ..models.ov_detector import OV_Uni3DETR
        return OV_Uni3DETR(cfg, zs_init=zs_init)
    return Uni3DETR(cfg)


def _apply(model, cfg, variables, batch, *, train, rngs=None, mutable=False,
           random_points=None):
    if isinstance(cfg, OVUni3DETRConfig):
        return model.apply(variables, batch, train=train, rngs=rngs,
                           mutable=mutable, random_points=random_points)
    return model.apply(variables, batch["points"], batch["pts_mask"],
                       train=train, rngs=rngs, mutable=mutable,
                       random_points=random_points)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    constants: Any = FrozenDict()  # frozen buffers (CLIP text embeddings)
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)


def make_optimizer(lr_schedule, weight_decay=0.01, clip_norm=10.0,
                   lr_mult_fn=None, momentum_schedule=None):
    """AdamW + global-norm clip (reference optimizer_config,
    uni3detr_sunrgbd.py:234-235).

    ``lr_mult_fn(path_str) -> float`` supports per-module lr multipliers
    (OV configs' paramwise_cfg): implemented as a per-leaf scale applied
    after AdamW.

    ``momentum_schedule``: step -> beta1, for the nuScenes cyclic
    momentum policy (uni3detr_nuscenes.py ``momentum_config``, mmcv
    CyclicMomentumUpdater over Adam beta1).
    """
    if momentum_schedule is not None:
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_schedule, b1=momentum_schedule,
            weight_decay=weight_decay)
    else:
        adamw = optax.adamw(lr_schedule, weight_decay=weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(clip_norm), adamw)
    if lr_mult_fn is not None:
        def per_leaf_scale(updates, state, params=None):
            del params
            scaled = jax.tree_util.tree_map_with_path(
                lambda path, u: u * lr_mult_fn(
                    "/".join(getattr(k, "key", str(k)) for k in path)),
                updates)
            return scaled, state
        tx = optax.chain(
            tx, optax.GradientTransformation(lambda p: optax.EmptyState(),
                                             per_leaf_scale))
    return tx


def step_lr_schedule(base_lr, steps_per_epoch, milestones, gamma=0.1,
                     warmup_steps=0, warmup_ratio=1.0 / 3):
    """mmcv step policy (lr_config step=[32,38], uni3detr_sunrgbd.py:238)."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps > 0:
        warm = optax.linear_schedule(base_lr * warmup_ratio, base_lr,
                                     warmup_steps)
        return optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def cyclic_lr_schedule(base_lr, total_steps, target_ratio=(10, 1e-4),
                       step_ratio_up=0.4):
    """mmcv cyclic policy (uni3detr_nuscenes.py lr_config)."""
    up = int(total_steps * step_ratio_up)
    down = total_steps - up
    peak = base_lr * target_ratio[0]
    end = base_lr * target_ratio[1]
    return optax.join_schedules(
        [optax.linear_schedule(base_lr, peak, up),
         optax.cosine_decay_schedule(peak, down, end / peak)],
        [up])


def cyclic_momentum_schedule(base_m, total_steps,
                             target_ratio=(0.85 / 0.95, 1.0),
                             step_ratio_up=0.4):
    """mmcv CyclicMomentumUpdater (uni3detr_nuscenes.py
    ``momentum_config``): beta1 moves inversely to the lr cycle —
    base -> base*r0 over the up phase, cosine back to base*r1 after."""
    up = int(total_steps * step_ratio_up)
    down = max(total_steps - up, 1)
    m1 = base_m * target_ratio[0]
    m2 = base_m * target_ratio[1]

    def cos_rise(t):
        # join_schedules passes the step count since the phase boundary
        f = jnp.clip(t / down, 0.0, 1.0)
        return m2 + (m1 - m2) * 0.5 * (1 + jnp.cos(jnp.pi * f))

    return optax.join_schedules(
        [optax.linear_schedule(base_m, m1, up), cos_rise], [up])


def create_train_state(cfg: Uni3DETRConfig, rng, sample_batch, tx,
                       zs_init=None):
    """Initialize model params/stats from a (host) sample batch."""
    model = build_model(cfg, zs_init=zs_init)
    B = next(iter(sample_batch.values())).shape[0]
    rp = jnp.zeros((B, cfg.num_query, 3), jnp.float32)
    rngs = {"params": rng, "modality": jax.random.PRNGKey(0)}
    # init MUST run as one jitted program: eager tracing executes hundreds
    # of small ops, which is slow everywhere and pathological on the axon
    # TPU runtime (see bench.py note)
    sample_batch = jax.tree_util.tree_map(jnp.asarray, sample_batch)
    if isinstance(cfg, OVUni3DETRConfig):
        variables = jax.jit(
            lambda r, b: model.init(r, b, train=False, random_points=rp)
        )(rngs, sample_batch)
    else:
        variables = jax.jit(
            lambda r, p, m: model.init(r, p, m, train=False,
                                       random_points=rp)
        )(rngs, sample_batch["points"], sample_batch["pts_mask"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    constants = variables.get("constants", FrozenDict())
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      constants=constants, tx=tx, apply_fn=model.apply)


def make_train_step(cfg: Uni3DETRConfig, donate: bool = True):
    """Returns jitted train_step(state, batch, rng) -> (state, logs).

    batch: points (B,P,C), pts_mask (B,P), gt_boxes (B,G,7|9) bottom-z
    storage layout, gt_labels (B,G), gt_mask (B,G).
    """
    from ..geom.boxes import gravity_center_boxes

    model = build_model(cfg)

    def loss_fn(params, batch_stats, constants, batch, rng):
        k1, k2 = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        if constants:
            variables["constants"] = constants
        outs, mut = _apply(model, cfg, variables, batch, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": k1, "modality": k2})
        gt = gravity_center_boxes(batch["gt_boxes"])
        total, logs = uni3detr_loss(outs, gt, batch["gt_labels"],
                                    batch["gt_mask"], cfg)
        return total, (mut["batch_stats"], logs)

    def train_step(state: TrainState, batch, rng):
        # fold the step counter in on device so callers can pass one base
        # key for the whole run (per-step host-side RNG ops are dispatch
        # overhead, pathological on the axon runtime)
        rng = jax.random.fold_in(rng, state.step)
        (total, (new_stats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.constants, batch, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = dict(logs)
        logs["total_loss"] = total
        logs["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), logs

    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)


def make_eval_step(cfg: Uni3DETRConfig):
    """Returns jitted eval_step(params, batch_stats, batch, rng) ->
    (boxes_bottom, scores, labels, valid) fixed-size detections.
    For OV models pass constants too (keyword)."""

    model = build_model(cfg)

    def eval_step(params, batch_stats, batch, rng, constants=None):
        B = next(iter(batch.values())).shape[0]
        rp = jax.random.uniform(rng, (B, cfg.num_query, 3))
        variables = {"params": params, "batch_stats": batch_stats}
        if constants:
            variables["constants"] = constants
        outs = _apply(model, cfg, variables, batch, train=False,
                      random_points=rp)
        boxes, scores, labels, valid = decode_predictions(outs, cfg)
        return post_process(boxes, scores, labels, valid, cfg)

    return jax.jit(eval_step)
