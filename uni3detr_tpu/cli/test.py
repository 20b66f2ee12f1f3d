"""Evaluation CLI: ``python -m uni3detr_tpu.cli.test CONFIG CKPT --eval bbox``.

Mirrors the reference test workflow (extra_tools/test.py): load config +
checkpoint, run inference over the val split, evaluate (indoor AP for
SUN RGB-D / ScanNet; detection dumps otherwise) or --format-only.
"""
from __future__ import annotations

import argparse
import json
import pickle

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a uni3detr_tpu model")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", default=None, help="e.g. bbox")
    p.add_argument("--out", default=None, help="dump detections pkl")
    p.add_argument("--format-only", action="store_true",
                   help="write submission files (KITTI txts / nuScenes "
                        "json) without computing metrics (reference "
                        "test.py --format-only)")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="eval batch size (default cfg samples_per_gpu)")
    p.add_argument("--show-dir", default=None,
                   help="write per-sample BEV PNGs (points + GT + dets) "
                        "to this directory (reference test.py "
                        "--show-dir; headless-friendly)")
    p.add_argument("--show-score-thr", type=float, default=0.3)
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation over the cfg 'tta' grid "
                        "(MultiRotScaleFlipAug3D equivalent)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(reference dist_test.sh)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import os
    import jax
    plat = os.environ.get("UNI3DETR_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if args.num_processes > 1:
        from ..parallel.mesh import init_distributed
        pid = args.process_id if args.process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0"))
        init_distributed(args.coordinator or "localhost:29400",
                         args.num_processes, pid)
    jax.config.update("jax_enable_compilation_cache", False)  # axon perf
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset, collate_batch
    from ..train.step import create_train_state, make_eval_step, \
        make_optimizer
    from ..train.checkpoint import load_checkpoint, restore_state
    from ..train.evaluator import run_inference_distributed, evaluate
    from ..parallel.mesh import is_main_process

    cfg = load_config(args.config)
    cfg = merge_cfg_options(cfg, args.cfg_options)
    model_cfg = build_model_config(cfg)
    dataset = build_dataset(cfg.data, cfg.class_names, model_cfg.pc_range,
                            "val")

    sample0 = dataset[0]
    batch0, _ = collate_batch([sample0], model_cfg.num_points,
                              model_cfg.max_gt,
                              model_cfg.in_point_features,
                              model_cfg.code_size)
    tx = make_optimizer(1e-4)
    zs_init = None
    zs_path = getattr(model_cfg, "zeroshot_path", None)
    if zs_path:
        zs_init = np.load(zs_path)
    state = create_train_state(model_cfg, jax.random.PRNGKey(0), batch0, tx,
                               zs_init=zs_init)
    if args.checkpoint:
        tree, _ = load_checkpoint(args.checkpoint, target_state=state,
                                  components=("params", "batch_stats",
                                              "step"))
        state = restore_state(state, tree)
        print(f"loaded checkpoint {args.checkpoint}")

    tta_grid = None
    if args.tta:
        from ..train.tta import make_aug_grid
        tcfg = cfg.get("tta", {})
        tta_grid = make_aug_grid(
            rot_degrees=tcfg.get("rot_degrees", (0.0,)),
            scales=tcfg.get("scales", (1.0,)),
            flips=tcfg.get("flips", (False, True)))
        print(f"TTA over {len(tta_grid)} augmentations")

    eval_fn = make_eval_step(model_cfg)
    # single process, many chips: shard the eval batch over the local
    # mesh (the reference needs one process per GPU for this). Activated
    # when batch_size divides into the device count.
    mesh = None
    bs = args.batch_size or cfg.data.get("samples_per_gpu", 1)
    if args.num_processes == 1 and jax.device_count() > 1 \
            and bs % jax.device_count() == 0:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"sharding eval batches over {jax.device_count()} devices")
    # multi-process: per-process round-robin shards + rank-0 gather
    # (reference multi_gpu_test --gpu_collect, extra_tools/test.py:221);
    # single process falls through to the plain pipelined loop
    dets, gts = run_inference_distributed(
        dataset, state, eval_fn, model_cfg, mesh=mesh,
        batch_size=bs,
        max_samples=args.max_samples, tta_grid=tta_grid,
        box_type=cfg.data.get("box_type", "Depth"), log=print,
        tmpdir=os.path.join(os.path.dirname(args.out) or ".",
                            ".dist_eval") if args.out
        else "/tmp/uni3detr_dist_eval")
    if not is_main_process():
        return  # results were gathered on process 0 (mmcv rank-0 eval)

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(dets, f)
        print(f"wrote {args.out}")
    if args.show_dir:
        from ..utils.visualize import save_results_bev
        save_results_bev(dataset, dets, args.show_dir,
                         score_thr=args.show_score_thr,
                         class_names=list(cfg.class_names))
    if args.format_only:
        evaluate(dets, gts, cfg, dataset,
                 out_prefix=args.out or "work_dirs/results",
                 format_only=True)
    elif args.eval:
        res = evaluate(dets, gts, cfg, dataset,
                       out_prefix=args.out or "work_dirs/results")
        print(json.dumps({k: float(v) for k, v in res.items()}, indent=2))


if __name__ == "__main__":
    main()
