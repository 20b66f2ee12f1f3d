"""Offline evaluation of dumped detections:
``python -m uni3detr_tpu.cli.eval_metric CONFIG RESULTS.pkl``.

Equivalent of the reference extra_tools/eval_metric.py (re-evaluate a
saved result pkl without re-running inference).
"""
from __future__ import annotations

import argparse
import json
import pickle



def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    from ..config import load_config, merge_cfg_options, build_model_config
    from ..data.datasets import build_dataset
    from ..data.eval.indoor_eval import indoor_eval, format_table
    from ..data.eval.kitti_eval import kitti_eval

    cfg = load_config(args.config)
    cfg = merge_cfg_options(cfg, args.cfg_options)
    mc = build_model_config(cfg)
    with open(args.results, "rb") as f:
        dets = pickle.load(f)
    dataset = build_dataset(cfg.data, cfg.class_names, mc.pc_range, "val")
    gts = []
    for i in range(len(dets)):
        s = dataset[i]
        gts.append({"boxes": s["gt_boxes"], "labels": s["gt_labels"]})
    if cfg.data["dataset_type"] == "kitti":
        res = kitti_eval(gts, dets, list(cfg.class_names))
        print(json.dumps(res, indent=2))
    else:
        res = indoor_eval(gts, dets, list(cfg.class_names),
                          seen_classes=cfg.get("seen_classes"))
        print(format_table(res, list(cfg.class_names)))


if __name__ == "__main__":
    main()
