"""Orbax checkpointing + staged branch loading.

Capability parity with the reference checkpoint flow: per-epoch
checkpoints with embedded meta (mmcv CheckpointHook, SURVEY.md §5),
`load_checkpoint`/`--resume-from`, and OV-style staged initialization that
imports separately-pretrained sub-branches by key prefix with stripping
(ov_uni3detr.py:118-165).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import numpy as np


def _ckpt(path):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_checkpoint(path: str, state, meta: Optional[Dict] = None):
    """Save params/batch_stats/opt_state/step under ``path``."""
    cptr, path = _ckpt(path)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "constants", None):
        tree["constants"] = state.constants
    cptr.save(path, tree, force=True)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            # reference embeds config text + CLASSES in every checkpoint
            # (extra_tools/train.py:224-234); default=str keeps arbitrary
            # config values serializable
            json.dump(meta, f, default=str)


def load_checkpoint(path: str, target_state=None,
                    components=("params", "batch_stats", "opt_state",
                                "step")):
    """Returns the tree {'params', 'batch_stats', 'opt_state', 'step'}
    (+ meta if present). Pass ``target_state`` (a TrainState) to restore
    with the original pytree structure (optax NamedTuples etc.) —
    otherwise optimizer state comes back as plain nested containers.
    ``components`` restricts what is restored (eval only needs
    params/batch_stats/step — the optimizer structure may differ)."""
    cptr, path = _ckpt(path)
    if target_state is not None:
        template = {k: getattr(target_state, k) for k in components}
        # partial: the on-disk tree may carry components the caller does
        # not restore — OV checkpoints store 'constants' (CLIP text
        # embeddings, rebuilt from zeroshot_path at init) which the
        # default resume template omits; eval omits opt_state. Entries
        # present in the template but missing on disk still error.
        tree = cptr.restore(path, item=template, partial_restore=True)
    else:
        tree = cptr.restore(path)
    meta = None
    mpath = os.path.join(path, "meta.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
    return tree, meta


def restore_state(state, tree):
    """Rebuild a TrainState from a structure-matched restored tree."""
    kw = {}
    if "params" in tree:
        kw["params"] = tree["params"]
    if "batch_stats" in tree:
        kw["batch_stats"] = tree["batch_stats"]
    if "opt_state" in tree:
        kw["opt_state"] = tree["opt_state"]
    if "constants" in tree:
        kw["constants"] = tree["constants"]
    if "step" in tree:
        kw["step"] = np.asarray(tree["step"], np.int32)
    return state.replace(**kw)


def load_branch(params: Dict, ckpt_params: Dict, src_prefix: str,
                dst_prefix: str) -> Dict:
    """Copy a sub-branch of a pretrained checkpoint into ``params``.

    ``src_prefix``/``dst_prefix`` are '/'-joined module paths; the OV
    configs use this to initialize the image and point branches from two
    separate pretrained runs (ov_uni3detr_sunrgbd_mm.py:38-41).
    """
    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])

    def path_str(p):
        return "/".join(getattr(k, "key", str(k)) for k in p)

    src = {path_str(p): v for p, v in
           jax.tree_util.tree_flatten_with_path(ckpt_params)[0]}
    out_flat = {}
    n_loaded = 0
    for p, v in flat_new.items():
        ps = path_str(p)
        if ps.startswith(dst_prefix):
            key = src_prefix + ps[len(dst_prefix):]
            if key in src and src[key].shape == v.shape:
                out_flat[p] = src[key]
                n_loaded += 1
                continue
        out_flat[p] = v
    treedef = jax.tree_util.tree_structure(params)
    leaves = [out_flat[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), n_loaded
