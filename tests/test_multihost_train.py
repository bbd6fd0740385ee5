"""Multi-host training end-to-end: 2 coordinator-connected CPU processes
(4 virtual devices each) must reproduce the loss trace of 1 process with
8 devices.

This is the TPU-native equivalent of the reference's 2-node torchrun
launch (ref: run_torchrun.sh:6-23, train_joint.py:132-134): the same
scripts/train.py entry point, jax.distributed + gloo collectives instead
of NCCL, per-host batch rows fed through
jax.make_array_from_process_local_data (parallel/distributed.put_global).
Loss identity across process layouts proves (a) every host assembles the
same global batch (hybrid.sample_global determinism), (b) the sharded
train step is layout-independent SPMD, and (c) rank-0 gating/checkpoint
collectives don't deadlock.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from synth_data import build_synth_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "scripts", "train.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _train_cmd(dataset_dir, ckpt_dir, loss_log, local_devices, mesh_data):
    return [
        sys.executable, TRAIN,
        "--model_dir", "dummy",
        "--model_size", "tiny",
        "--dataset_dir", dataset_dir,
        "--ckpt_dir", ckpt_dir,
        "--dataset", "mevis,reason_seg",
        "--sample_rates", "1,1",
        "--epochs", "1",
        "--steps_per_epoch", "2",
        "--micro_batch_size", "2",
        "--grad_accum_steps", "2",
        "--num_frames_mllm", "2",
        "--num_frames_sam", "1",
        "--mask_res", "64",
        "--no_eval",
        "--local_devices", str(local_devices),
        "--platform", "cpu",
        "--mesh_data", str(mesh_data),
        "--loss_log", loss_log,
        "--data_workers", "0",
        "--no_auto_resume",
    ]


def _subprocess_env():
    # the pytest process forces 8 virtual devices via XLA_FLAGS
    # (conftest.py); children pick their own count via --local_devices
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return env


def _run_config(tmp_path, root, tag, nproc):
    """Launch `nproc` coordinator-connected train.py processes over a
    total of 8 virtual CPU devices; return the rank-0 loss trace."""
    loss_log = str(tmp_path / f"loss_{tag}.json")
    ckpt_dir = str(tmp_path / f"ckpt_{tag}")
    cmd = _train_cmd(root, ckpt_dir, loss_log, 8 // nproc, mesh_data=2)
    env = _subprocess_env()
    procs = []
    if nproc > 1:
        port = _free_port()
        for i in range(nproc):
            procs.append(subprocess.Popen(
                cmd + [
                    "--coordinator_address", f"127.0.0.1:{port}",
                    "--num_processes", str(nproc),
                    "--process_id", str(i),
                ],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            ))
    else:
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"train proc failed:\n{out[-4000:]}"
    with open(loss_log) as f:
        return json.load(f)["loss"]


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    root = build_synth_root(str(tmp_path / "data"))
    loss_1p = _run_config(tmp_path, root, "1p", nproc=1)
    loss_2p = _run_config(tmp_path, root, "2p", nproc=2)
    assert len(loss_1p) == len(loss_2p) == 2
    # bf16 compute: cross-process gloo reductions may order differently
    # than the single-process layout; identity up to rounding
    np.testing.assert_allclose(loss_1p, loss_2p, rtol=5e-4)
