"""Subprocess worker for tests/test_multihost.py (NOT a pytest module).

Runs one of N processes of a multi-host training job over loopback:
4 virtual CPU devices per process, ``jax.distributed.initialize`` against
a local coordinator, tiny-model train steps on a per-process shard of a
deterministic global batch, losses dumped to a JSON file. SURVEY.md §4:
this is how "multi-node" is tested without a TPU pod.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GLOBAL_BS = 8
N_STEPS = 2


def make_global_batch():
    """Deterministic global batch, identical in every process."""
    import numpy as np
    from tiny import synth_scene, pad_batch
    rng = np.random.RandomState(0)
    scenes = [synth_scene(rng) for _ in range(GLOBAL_BS)]
    pts, pmask, boxes, labels, gmask = pad_batch(scenes)
    return {"points": pts, "pts_mask": pmask, "gt_boxes": boxes,
            "gt_labels": labels, "gt_mask": gmask}


def run_steps(local_batch_fn, shard_fn, ckpt_dir=None):
    """Shared by the worker and the single-process reference: init state,
    replicate, run N_STEPS on the (globally identical) batch.

    ``ckpt_dir``: exercise the multi-process checkpoint path the train
    CLI uses — EVERY process calls the orbax save (orbax coordinates its
    own cross-process barriers; a main-only save deadlocks on
    Checkpointer:save_start) — then restore and check the round trip."""
    import jax
    from tiny import TINY
    from uni3detr_tpu.parallel.mesh import (make_mesh, set_active_mesh,
                                            replicate)
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_train_step, make_optimizer)

    mesh = make_mesh()
    set_active_mesh(mesh)
    batch_local = local_batch_fn()
    tx = make_optimizer(lambda _: 1e-3)
    state = create_train_state(TINY, jax.random.PRNGKey(0), batch_local, tx)
    state = state.replace(params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    gb = shard_fn(batch_local, mesh)
    step_fn = make_train_step(TINY, donate=False)
    losses, gnorms = [], []
    for _ in range(N_STEPS):
        state, logs = step_fn(state, gb, jax.random.PRNGKey(1))
        losses.append(float(logs["total_loss"]))
        gnorms.append(float(logs["grad_norm"]))
    if ckpt_dir is not None:
        import numpy as np
        from uni3detr_tpu.parallel.mesh import is_main_process, barrier
        from uni3detr_tpu.train.checkpoint import (save_checkpoint,
                                                   load_checkpoint,
                                                   restore_state)
        save_checkpoint(ckpt_dir, state,
                        {"step": int(state.step)} if is_main_process()
                        else None)
        if jax.process_count() > 1:
            barrier("ckpt")
        tree, _ = load_checkpoint(ckpt_dir, target_state=state)
        restored = restore_state(state, tree)
        assert int(restored.step) == int(state.step)
        pre = jax.tree_util.tree_leaves(state.params)
        post = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(pre, post):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    set_active_mesh(None)
    return losses, gnorms


def main():
    pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.device_count() == 4 * nproc
    from uni3detr_tpu.parallel.mesh import local_slice, global_batch

    def local_batch():
        full = make_global_batch()
        sl = local_slice(GLOBAL_BS)
        return {k: v[sl] for k, v in full.items()}

    losses, gnorms = run_steps(local_batch, global_batch,
                               ckpt_dir=ckpt_dir)

    # dist-eval gather seam (run_inference_distributed's collector):
    # every process contributes, rank 0 sees process-index order. Cover
    # BOTH transports: the default device collective (no shared fs;
    # per-rank payload sizes differ to exercise the padding) and the
    # shared-directory protocol (UNI3DETR_GATHER=file).
    from uni3detr_tpu.parallel.mesh import gather_objects
    gdir = os.path.join(os.path.dirname(outfile), "gather_rt")
    for transport in ("device", "file"):
        os.environ["UNI3DETR_GATHER"] = transport
        parts = gather_objects({"pid": pid, "n": pid * 10,
                                "pad": "x" * (100 * (pid + 1))}, gdir)
        if pid == 0:
            assert [p["pid"] for p in parts] == list(range(nproc)), parts
            assert parts[1]["n"] == 10 and len(parts[1]["pad"]) == 200
        else:
            assert parts is None
    del os.environ["UNI3DETR_GATHER"]

    # Distributed eval end-to-end with the GLOBAL mesh ACTIVE (the train
    # CLI's EvalHook state) and an ODD dataset size (5 over 2 procs ->
    # unequal round-robin shards): the evaluator must deactivate the
    # mesh around its process-local forward (constrain() would otherwise
    # emit shardings over non-addressable devices) and the gather must
    # not require a shared filesystem.
    import dataclasses
    import numpy as np
    from tiny import TINY, synth_scene
    from uni3detr_tpu.data.datasets import collate_batch
    from uni3detr_tpu.parallel.mesh import (make_mesh, set_active_mesh,
                                            replicate)
    from uni3detr_tpu.train.step import (create_train_state,
                                         make_eval_step, make_optimizer)
    from uni3detr_tpu.train.evaluator import run_inference_distributed

    cfg_ev = dataclasses.replace(TINY, num_points=512, max_gt=8)
    rng = np.random.RandomState(7)
    dataset = []
    for _ in range(5):
        p, b, l = synth_scene(rng)
        dataset.append({"points": p, "gt_boxes": b, "gt_labels": l})
    mesh = make_mesh()
    set_active_mesh(mesh)
    init_batch, _ = collate_batch(dataset[:1], cfg_ev.num_points,
                                  cfg_ev.max_gt, cfg_ev.in_point_features,
                                  cfg_ev.code_size)
    st = create_train_state(cfg_ev, jax.random.PRNGKey(0), init_batch,
                            make_optimizer(lambda _: 1e-3))
    st = st.replace(params=replicate(st.params, mesh),
                    batch_stats=replicate(st.batch_stats, mesh))
    dets, gts = run_inference_distributed(dataset, st,
                                          make_eval_step(cfg_ev), cfg_ev,
                                          batch_size=1)
    if pid == 0:
        assert len(dets) == 5 and len(gts) == 5, (len(dets), len(gts))
        assert all(d is not None and "boxes" in d for d in dets)
    else:
        assert dets == [] and gts == []
    set_active_mesh(None)

    with open(outfile, "w") as f:
        json.dump({"process": pid, "losses": losses, "gnorms": gnorms}, f)


if __name__ == "__main__":
    main()
