"""Graceful preemption (trainer.save_on_preempt): SIGTERM mid-training must
checkpoint at the next step boundary, exit 0, and leave a resumable run —
the behavior cloud TPU / SLURM preemption grace windows require. The
reference has no equivalent (SURVEY §5.3: recovery is manual resume only).
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    from gennerf_tpu.data.synthetic import generate_scene

    root = tmp_path_factory.mktemp("synth_pre")
    info_path = generate_scene(str(root), num_frames=6, H=32, W=40,
                               voxel_sizes=(8,))
    return str(root), info_path


def _args(root, out, extra=()):
    return [
        sys.executable, os.path.join(REPO, "scripts", "train.py"),
        "experiment=overfit_synthetic", "data=frame", "trainer=cpu",
        f"paths.data_dir={root}", f"paths.output_dir={out}",
        "trainer.max_epochs=200", "trainer.num_sanity_val_steps=0",
        "trainer.check_val_every_n_epoch=1000", "trainer.log_every_n_steps=1",
        "data.frame_idx=0", "data.length_train=4", "data.length_val=1",
        "data.voxel_dim_train=[16,16,8]", "data.voxel_dim_val=[16,16,8]",
        "data.voxel_dim_test=[16,16,8]", "data.voxel_size=0.08",
        "model.encoder.pointnet.plane_resolution=16",
        "model.encoder.pointnet.num_sparse_points=32",
        "model.mlp.d_hidden=32", "model.mlp.n_blocks=2",
        "model.ray.num_rays=8", "test=false",
        *extra,
    ]


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(synth_data, tmp_path):
    root, _ = synth_data
    out = str(tmp_path / "run")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.Popen(_args(root, out), text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            env=env)
    # wait until at least one epoch completed (so a step boundary exists),
    # then preempt
    log_lines = []
    deadline = time.time() + 300
    try:
        for line in proc.stdout:
            log_lines.append(line)
            if "epoch 1:" in line:
                break
            if time.time() > deadline:
                raise AssertionError("no epoch finished before deadline:\n" + "".join(log_lines[-20:]))
        proc.send_signal(signal.SIGTERM)
        tail, _ = proc.communicate(timeout=120)
        log_lines.append(tail)
    finally:
        if proc.poll() is None:
            proc.kill()
    full = "".join(log_lines)
    assert proc.returncode == 0, full[-3000:]
    assert "SIGTERM: checkpointing" in full, full[-3000:]
    assert "preempted during epoch" in full, full[-3000:]
    ckpt = os.path.join(out, "checkpoints")
    assert os.path.isdir(ckpt)
    epochs = [d for d in os.listdir(ckpt) if d.isdigit()]
    assert epochs, os.listdir(ckpt)
    assert os.path.exists(os.path.join(ckpt, "config.json"))

    # resume from the preempt checkpoint and finish a short run cleanly
    out2 = str(tmp_path / "resume")
    rc = subprocess.run(
        _args(root, out2, extra=[f"ckpt_path={ckpt}", "trainer.max_epochs="
                                 + str(max(int(e) for e in epochs) + 2)]),
        timeout=300, capture_output=True, text=True, env=env,
    )
    assert rc.returncode == 0, rc.stderr[-2000:] + rc.stdout[-2000:]
    assert "resumed from" in rc.stdout, rc.stdout[-2000:]
