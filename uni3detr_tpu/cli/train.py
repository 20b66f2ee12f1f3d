"""Training CLI: ``python -m uni3detr_tpu.cli.train CONFIG [options]``.

Mirrors the reference workflow (extra_tools/train.py + dist_train.sh):
config file + dotted --cfg-options overrides, work_dir checkpoints per
epoch, periodic logging. Multi-chip runs use one process over all local
devices with GSPMD (no torch.distributed.launch equivalent needed).
"""
from __future__ import annotations

import argparse
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a uni3detr_tpu model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (smoke runs)")
    p.add_argument("--spatial-shard", type=int, default=1,
                   help="mesh size along the spatial axis")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(reference dist_train.sh torch.distributed.launch)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def batch_iterator(dataset, batch_size, cfg_model, rng, pool,
                   local=slice(None)):
    """Shuffled epoch iterator with threaded sample loading. The tail
    partial batch is padded by wrapping to the epoch's first samples so
    every sample is seen and the jitted step keeps one static shape.

    ``local``: this process's slice of each global batch — every process
    draws the same shuffled order (same seed), so the per-process shards
    assemble into a consistent global batch (mesh.global_batch)."""
    order = rng.permutation(len(dataset))
    if len(order) % batch_size:
        # np.resize wraps, covering datasets smaller than one batch too
        order = np.resize(order, len(order) + batch_size
                          - len(order) % batch_size)
    from ..data.datasets import collate_batch
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idxs = order[i:i + batch_size][local]
        samples = list(pool.map(dataset.__getitem__, idxs))
        batch, metas = collate_batch(
            samples, cfg_model.num_points, cfg_model.max_gt,
            cfg_model.in_point_features, cfg_model.code_size)
        yield batch, metas


from ..data.loading import prefetch  # noqa: E402 (re-export; shared with eval)


def main():
    args = parse_args()
    import jax
    # sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon on this
    # image, so the plain env var cannot select CPU; honor an explicit
    # override through jax.config before any backend initializes
    plat = os.environ.get("UNI3DETR_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if args.num_processes > 1:
        # reference: init_dist NCCL before anything touches devices
        # (extra_tools/train.py:152-160)
        from ..parallel.mesh import init_distributed
        pid = args.process_id if args.process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0"))
        init_distributed(args.coordinator or "localhost:29400",
                         args.num_processes, pid)
    jax.config.update("jax_enable_compilation_cache", False)  # axon perf
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset
    from ..parallel.mesh import (make_mesh, global_batch, replicate,
                                 set_active_mesh, is_main_process,
                                 local_slice, barrier)
    from ..train.step import (create_train_state, make_train_step,
                              make_optimizer, step_lr_schedule,
                              cyclic_lr_schedule, cyclic_momentum_schedule)
    from ..train.checkpoint import save_checkpoint, load_checkpoint, \
        restore_state

    cfg = load_config(args.config)
    cfg = merge_cfg_options(cfg, args.cfg_options)
    model_cfg = build_model_config(cfg)
    work_dir = args.work_dir or cfg.get("work_dir") or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    log_name = "train.log" if is_main_process() \
        else f"train.rank{jax.process_index()}.log"
    logging.basicConfig(
        level=logging.INFO if is_main_process() else logging.WARNING,
        format="%(asctime)s %(message)s", force=True,
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(work_dir, log_name))])
    log = logging.getLogger("train")
    log.info("config: %s", args.config)
    log.info("devices: %d global / %d local, %d processes",
             jax.device_count(), jax.local_device_count(),
             jax.process_count())

    seed = args.seed if args.seed is not None else cfg.get("seed", 0)
    rng = np.random.RandomState(seed)

    dataset = build_dataset(cfg.data, cfg.class_names, model_cfg.pc_range,
                            "train")
    # global batch over every data-parallel device in the job (autoscale
    # semantics of samples_per_gpu x world_size, reference train.py:148)
    bs = cfg.data.get("samples_per_gpu", 2) * max(
        1, jax.device_count() // args.spatial_shard)
    batch_slice = local_slice(bs) if jax.process_count() > 1 \
        else slice(None)
    steps_per_epoch = max(len(dataset) // bs, 1)
    epochs = cfg.get("total_epochs", 40)

    opt = cfg.get("optimizer", {})
    lr_cfg = cfg.get("lr_config", {"policy": "step", "step": [1 << 30]})
    if lr_cfg.get("policy") == "cyclic":
        sched = cyclic_lr_schedule(
            opt.get("lr", 1e-4), steps_per_epoch * epochs,
            tuple(lr_cfg.get("target_ratio", (10, 1e-4))),
            lr_cfg.get("step_ratio_up", 0.4))
    else:
        sched = step_lr_schedule(opt.get("lr", 1e-4), steps_per_epoch,
                                 lr_cfg.get("step", []))
    lr_mult = dict(cfg.get("lr_mult") or {})
    # frozen_stages -> zero-update mask (reference ResNet frozen_stages=1,
    # ov_uni3detr_sunrgbd_mm.py; requires_grad=False semantics: the 0x
    # multiplier also kills AdamW weight decay on those leaves)
    fs = getattr(model_cfg, "frozen_stages", -1)
    if getattr(model_cfg, "use_camera", False) and fs >= 0:
        from ..models.resnet import ResNet
        for p in ResNet.frozen_param_prefixes(fs):
            lr_mult[p] = 0.0
    lr_mult_fn = None
    if lr_mult:
        def lr_mult_fn(path):
            for prefix, m in lr_mult.items():
                if path.startswith(prefix):
                    return m
            return 1.0
    # cyclic momentum (nuScenes momentum_config, mmcv
    # CyclicMomentumUpdater over Adam beta1)
    mom_cfg = cfg.get("momentum_config") or {}
    mom_sched = None
    if mom_cfg.get("policy") == "cyclic":
        mom_sched = cyclic_momentum_schedule(
            opt.get("beta1", 0.9), steps_per_epoch * epochs,
            tuple(mom_cfg.get("target_ratio", (0.85 / 0.95, 1.0))),
            mom_cfg.get("step_ratio_up", 0.4))
    tx = make_optimizer(sched, opt.get("weight_decay", 0.01),
                        opt.get("clip_norm", 10.0), lr_mult_fn=lr_mult_fn,
                        momentum_schedule=mom_sched)

    mesh = make_mesh(spatial=args.spatial_shard)
    set_active_mesh(mesh if len(jax.devices()) > 1 else None)

    pool = ThreadPoolExecutor(max_workers=cfg.data.get(
        "workers_per_gpu", 4))
    first_batch, _ = next(batch_iterator(dataset, bs, model_cfg, rng, pool,
                                         batch_slice))
    zs_init = None
    zs_path = getattr(model_cfg, "zeroshot_path", None)
    if zs_path:
        zs_init = np.load(zs_path)
        log.info("loaded CLIP embeddings %s %s", zs_path, zs_init.shape)
    state = create_train_state(model_cfg, jax.random.PRNGKey(seed),
                               first_batch, tx, zs_init=zs_init)

    # OV staged init: import separately-pretrained branches by prefix
    # (reference ov_uni3detr.py:118-165)
    from ..train.checkpoint import load_branch
    for src, keys in ((cfg.get("pretrained_pts"), cfg.get("load_pts")),
                      (cfg.get("pretrained_img"), cfg.get("load_img"))):
        if src and keys:
            tree, _ = load_checkpoint(src)
            params = state.params
            for k in keys:
                params, n = load_branch(params, tree["params"], k, k)
                log.info("staged init: %s <- %s (%d tensors)", k, src, n)
            state = state.replace(params=params)
    if jax.device_count() > 1:
        state = state.replace(params=replicate(state.params, mesh),
                              batch_stats=replicate(state.batch_stats, mesh),
                              opt_state=replicate(state.opt_state, mesh))

    start_epoch = 0
    resume = args.resume_from or cfg.get("resume_from")
    if resume:
        tree, meta = load_checkpoint(resume, target_state=state)
        state = restore_state(state, tree)
        start_epoch = (meta or {}).get("epoch", 0)
        log.info("resumed from %s at epoch %d", resume, start_epoch)

    # EvalHook: periodic val-split eval (reference `evaluation =
    # dict(interval=N)`, uni3detr_sunrgbd.py:227; mmcv EvalHook)
    eval_int = cfg.get("evaluation", {}).get("interval", 0)
    val_dataset = eval_fn = None
    if eval_int:
        from ..train.step import make_eval_step
        from ..train.evaluator import evaluate
        val_dataset = build_dataset(cfg.data, cfg.class_names,
                                    model_cfg.pc_range, "val")
        eval_fn = make_eval_step(model_cfg)

    def ckpt_meta(epoch, step):
        """Checkpoint meta mirrors what the reference embeds: config +
        CLASSES alongside epoch/step (extra_tools/train.py:224-234)."""
        return {"epoch": epoch, "step": step,
                "classes": list(cfg.class_names),
                "config_path": os.path.abspath(args.config),
                "config": dict(cfg)}

    def save_ckpt(path, st, meta):
        """Multi-process: EVERY process calls the orbax save — orbax
        coordinates internally (the primary host writes the replicated
        arrays, the rest join its sync barriers; a main-only save
        deadlocks on Checkpointer:save_start). Only the main process
        writes meta.json."""
        if jax.process_count() > 1:
            save_checkpoint(path, st, meta if is_main_process() else None)
            barrier("ckpt")
        else:
            save_checkpoint(path, st, meta)

    step_fn = make_train_step(model_cfg)
    base_key = jax.random.PRNGKey(seed + 1)  # folded with step on device
    log_int = cfg.get("log_config", {}).get("interval", 50)
    ckpt_int = cfg.get("checkpoint_config", {}).get("interval", 1)
    gstep = int(state.step)
    t_last = time.time()
    for epoch in range(start_epoch, epochs):
        for batch, _ in prefetch(
                batch_iterator(dataset, bs, model_cfg, rng, pool,
                               batch_slice)):
            if jax.device_count() > 1:
                batch = global_batch(batch, mesh)
            state, logs = step_fn(state, batch, base_key)
            gstep += 1
            if gstep % log_int == 0:
                logs = {k2: float(v) for k2, v in logs.items()}
                dt = time.time() - t_last
                t_last = time.time()
                log.info("epoch %d step %d | %.2f it/s | total %.4f "
                         "cls %.4f bbox %.4f iou %.4f ioup %.4f gnorm %.2f",
                         epoch, gstep, log_int / max(dt, 1e-9),
                         logs["total_loss"], logs["loss_cls"],
                         logs["loss_bbox"], logs["loss_iou"],
                         logs["loss_iou_pred"], logs["grad_norm"])
            if args.max_steps and gstep >= args.max_steps:
                save_ckpt(os.path.join(work_dir, "latest"), state,
                          ckpt_meta(epoch, gstep))
                log.info("max steps reached; checkpoint saved")
                return
        if (epoch + 1) % ckpt_int == 0:
            save_ckpt(os.path.join(work_dir, f"epoch_{epoch+1}"),
                      state, ckpt_meta(epoch + 1, gstep))
            save_ckpt(os.path.join(work_dir, "latest"), state,
                      ckpt_meta(epoch + 1, gstep))
            log.info("checkpoint saved at epoch %d", epoch + 1)
        if eval_int and (epoch + 1) % eval_int == 0:
            from ..train.evaluator import run_inference_distributed
            dets, gts = run_inference_distributed(
                val_dataset, state, eval_fn, model_cfg,
                batch_size=cfg.data.get("samples_per_gpu", 1),
                max_samples=cfg.get("evaluation", {}).get("max_samples"),
                box_type=cfg.data.get("box_type", "Depth"),
                tmpdir=os.path.join(work_dir, ".dist_eval"))
            if is_main_process():
                res = evaluate(dets, gts, cfg, val_dataset, log=log.info)
                log.info("eval epoch %d | %s", epoch + 1,
                         " ".join(f"{k}={v:.4f}" for k, v in res.items()
                                  if isinstance(v, float) and v == v))
            t_last = time.time()


if __name__ == "__main__":
    main()
