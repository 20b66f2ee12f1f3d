"""Multi-host distributed training test (VERDICT round-2 item 3).

2 subprocesses x 4 virtual CPU devices with a loopback
``jax.distributed`` coordinator run the same tiny training job as a
single 8-device process; the global per-step losses and grad norms must
match. This exercises the full multi-host path the CLIs use:
``init_distributed`` -> global mesh -> per-process batch shards ->
``global_batch`` assembly -> GSPMD collectives over Gloo (the CPU
stand-in for ICI/DCN). Reference equivalent: torch.distributed.launch +
DDP NCCL (extra_tools/train.py:152-160, dist_train.sh:8).
"""
import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def test_two_process_loss_matches_single_process(tmp_path):
    # single-process reference on this process's 8 virtual devices
    sys.path.insert(0, HERE)
    from multihost_worker import make_global_batch, run_steps
    from uni3detr_tpu.parallel.mesh import shard_batch

    ref_losses, ref_gnorms = run_steps(make_global_batch, shard_batch)

    port = random.randint(20000, 39999)
    procs, outs = [], []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    ckpt_dir = tmp_path / "mh_ckpt"  # shared: pins the all-process
    # orbax save the train CLI uses (main-only save deadlocks)
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out),
             str(ckpt_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr.decode()[-3000:]

    results = [json.loads(out.read_text()) for out in outs]
    # both processes observe the same global loss (it's a psum-reduced
    # scalar), and it matches the single-process run on the same batch
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=2e-5)
    np.testing.assert_allclose(results[0]["gnorms"], ref_gnorms, rtol=2e-4)
