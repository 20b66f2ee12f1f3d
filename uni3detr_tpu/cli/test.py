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
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    jax.config.update("jax_enable_compilation_cache", False)  # axon perf
    import jax.numpy as jnp
    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset, collate_batch
    from ..data.eval.indoor_eval import indoor_eval, format_table
    from ..train.step import create_train_state, make_eval_step, \
        make_optimizer
    from ..train.checkpoint import load_checkpoint, restore_state

    cfg = load_config(args.config)
    cfg = merge_cfg_options(cfg, args.cfg_options)
    model_cfg = build_model_config(cfg)
    dataset = build_dataset(cfg.data, cfg.class_names, model_cfg.pc_range,
                            "val")
    n = len(dataset) if args.max_samples is None else min(
        len(dataset), args.max_samples)

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

    eval_fn = make_eval_step(model_cfg)
    key = jax.random.PRNGKey(0)
    dets, gts = [], []
    for i in range(n):
        s = dataset[i]
        batch, metas = collate_batch([s], model_cfg.num_points,
                                     model_cfg.max_gt,
                                     model_cfg.in_point_features,
                                     model_cfg.code_size)
        key, k = jax.random.split(key)
        boxes, scores, labels, valid = jax.tree_util.tree_map(
            np.asarray,
            eval_fn(state.params, state.batch_stats, batch, k,
                    constants=state.constants))
        v = valid[0]
        det = {"boxes": boxes[0][v], "scores": scores[0][v],
               "labels": labels[0][v]}
        if model_cfg.post_processing == "box_merging":
            from ..data.eval.box_merging import merge_boxes_3d
            l2, b2, s2, _ = merge_boxes_3d(det["labels"], det["boxes"],
                                           det["scores"])
            det = {"boxes": b2, "scores": s2, "labels": l2}
            if model_cfg.score_thr is not None:
                thr = (np.asarray(model_cfg.score_thr)[det["labels"]]
                       if isinstance(model_cfg.score_thr, (tuple, list))
                       else model_cfg.score_thr)
                keep = det["scores"] > thr
                det = {k: det[k][keep] for k in det}
        dets.append(det)
        gts.append({"boxes": s["gt_boxes"], "labels": s["gt_labels"]})
        if (i + 1) % 25 == 0:
            print(f"[{i+1}/{n}]")

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(dets, f)
        print(f"wrote {args.out}")
    if args.eval:
        dtype_ = cfg.data["dataset_type"]
        if dtype_ == "kitti":
            from ..data.eval.kitti_eval import kitti_eval
            res = kitti_eval(gts, dets, list(cfg.class_names))
            print(json.dumps(res, indent=2))
        elif dtype_ == "nuscenes":
            from ..data.eval.nuscenes_eval import format_results
            out_json = (args.out or "work_dirs/results") + "_nusc.json"
            infos = [dataset.infos[i] for i in range(n)] \
                if hasattr(dataset, "infos") else []
            format_results(dets, infos, list(cfg.class_names), out_json)
            print(f"wrote nuScenes submission {out_json} (official eval "
                  "requires nuscenes-devkit)")
        else:
            res = indoor_eval(gts, dets, list(cfg.class_names),
                              seen_classes=cfg.get("seen_classes"))
            print(format_table(res, list(cfg.class_names)))
            print(json.dumps({k: v for k, v in res.items()
                              if isinstance(v, float)}, indent=2))


if __name__ == "__main__":
    main()
