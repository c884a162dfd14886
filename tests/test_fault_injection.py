"""Fault injection: SIGKILL a live tracking run mid-sequence and resume.

The claim under test is utils/checkpoint.py's: a checkpoint directory is
crash-consistent (kill at ANY instant leaves a loadable checkpoint) and a
resumed run continues *identically* — the resumed trajectory file is
byte-for-byte equal to an unbroken run's. The reference has no recovery
story at all (its only persistence is per-pair .npy dumps,
python/pairwise_pnp.py:694); a preempted production run must not lose the
map or fork the trajectory.

Also the end-to-end CLI smoke test (cli/track.py drives the full engine
and writes poses/PLY/metrics/plot artifacts) — the whole user surface in
one subprocess.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

BASE = "/root/reference/datasets/kitti/sequences/00/image_0"
GT = "/root/reference/outputs/00.txt"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference dataset not mounted"
)


def _cli_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the real TPU out of it
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            "JAX_COMPILATION_CACHE_DIR": os.path.join(
                os.path.dirname(__file__), ".jax_cache"
            ),
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
            "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
            "PYTHONPATH": _REPO,
        }
    )
    return env


def _track(args, timeout=420, **popen_kw):
    cmd = [
        sys.executable,
        "-m",
        "maveric_slam_tpu.cli.track",
        BASE,
        "--img-glob",
        "00016*.png",  # the contiguous 160-169 run
    ] + args
    return subprocess.Popen(
        cmd,
        env=_cli_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        **popen_kw,
    )


def test_cli_smoke_artifacts(tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    p = _track(
        [
            "--out-dir",
            out,
            "--gt",
            GT,
            "--gt-offset",
            "160",
            "--plot",
            "--checkpoint",
            ckpt,
        ]
    )
    stdout, _ = p.communicate(timeout=420)
    assert p.returncode == 0, stdout[-3000:]

    poses = np.loadtxt(os.path.join(out, "poses.txt"))
    assert poses.shape == (10, 12)
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["ate_rmse"] < 1.0, metrics
    ply = open(os.path.join(out, "trajectory.ply")).read()
    assert ply.startswith("ply") and "element vertex 10" in ply
    assert os.path.getsize(os.path.join(out, "trajectory.png")) > 0
    # Checkpoint written by the CLI restores.
    with open(os.path.join(ckpt, "meta.json")) as f:
        assert json.load(f)["frame_idx"] == 9


def test_sigkill_mid_run_resumes_identically(tmp_path):
    out_a = str(tmp_path / "unbroken")
    out_c = str(tmp_path / "resumed")
    ckpt = str(tmp_path / "ckpt")

    # Unbroken run: the answer.
    p = _track(["--out-dir", out_a])
    stdout, _ = p.communicate(timeout=420)
    assert p.returncode == 0, stdout[-3000:]

    # Victim run: checkpoints every 2 frames; SIGKILL it the moment a
    # mid-sequence checkpoint lands (it may be mid-frame or even
    # mid-checkpoint-write when the signal arrives — that's the point).
    meta_path = os.path.join(ckpt, "meta.json")
    victim = _track(
        ["--out-dir", str(tmp_path / "junk"), "--checkpoint", ckpt,
         "--checkpoint-every", "2"]
    )
    deadline = time.time() + 420
    frame = -1
    while time.time() < deadline:
        if victim.poll() is not None:
            pytest.fail("victim finished before it could be killed")
        try:
            with open(meta_path) as f:
                frame = json.load(f)["frame_idx"]
        except (FileNotFoundError, json.JSONDecodeError):
            frame = -1
        if frame >= 3:
            break
        time.sleep(0.05)
    assert frame >= 3, "no mid-sequence checkpoint appeared in time"
    victim.send_signal(signal.SIGKILL)
    victim.communicate()
    assert victim.returncode == -signal.SIGKILL

    # The checkpoint directory must be loadable (crash-consistent) and the
    # resumed run must complete the sequence identically.
    p = _track(["--out-dir", out_c, "--resume", ckpt])
    stdout, _ = p.communicate(timeout=420)
    assert p.returncode == 0, stdout[-3000:]
    assert "resumed at frame" in stdout

    a = open(os.path.join(out_a, "poses.txt"), "rb").read()
    c = open(os.path.join(out_c, "poses.txt"), "rb").read()
    assert a == c, "resumed trajectory diverged from the unbroken run"
