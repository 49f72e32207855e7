"""eval.py CLI — subprocess tests for the three eval flows (SURVEY C11).

These pin the CLI *wiring* (config -> model -> data -> metrics JSON), not
model quality: fresh params are evaluated (checkpoint restore is covered by
the trainer round-trip tests and the bitwise CLI resume test).  Rooms are
tiny caller-written .npy files so the O(N^2) reference impl stays cheap on
the CPU backend.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ENV = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")


def _run(args, timeout=600):
    out = subprocess.run([sys.executable, "eval.py"] + args,
                         capture_output=True, text=True, env=ENV,
                         timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{")]
    assert recs, out.stdout
    return recs[-1]


def _write_rooms(tmp_path, n_rooms=2, n=1200):
    rng = np.random.RandomState(3)
    for i in range(n_rooms):
        xyz = rng.uniform(0.0, 2.0, (n, 3)).astype(np.float32)
        rgb = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
        lab = rng.randint(0, 5, (n, 1)).astype(np.float32)
        np.save(tmp_path / f"room{i}.npy",
                np.concatenate([xyz, rgb, lab], axis=1))


@pytest.mark.slow
def test_eval_cli_classification_voting(tmp_path):
    rec = _run(["--config", "cls_tiny", "--votes", "2"])
    assert rec["metric"] == "classification_accuracy"
    assert 0.0 <= rec["value"] <= 1.0
    assert 0.0 <= rec["mean_class_accuracy"] <= 1.0
    assert rec["votes"] == 2 and rec["n"] > 0


@pytest.mark.slow
def test_eval_cli_segmentation_voting_and_streaming(tmp_path):
    _write_rooms(tmp_path)
    vote = _run(["--config", "seg_tiny_stream", "--data-dir",
                 os.fspath(tmp_path)])
    assert vote["metric"] == "segmentation" and vote["scenes"] == 2
    assert 0.0 <= vote["accuracy"] <= 1.0 and 0.0 <= vote["miou"] <= 1.0

    stream = _run(["--config", "seg_tiny_stream", "--data-dir",
                   os.fspath(tmp_path), "--streaming"])
    assert stream["metric"] == "segmentation_streaming"
    assert stream["scenes"] == 2
    assert 0.0 <= stream["accuracy"] <= 1.0 and 0.0 <= stream["miou"] <= 1.0


@pytest.mark.slow
def test_eval_cli_streaming_rejects_global_context():
    # a global-context checkpoint cannot be restored into the locality-only
    # streaming net — the CLI must fail with the *_local guidance, not a
    # flax shape error (round-5 scenenn anchor session)
    out = subprocess.run(
        [sys.executable, "eval.py", "--config", "s3dis_synthetic",
         "--streaming"],
        capture_output=True, text=True, env=ENV, timeout=600)
    assert out.returncode != 0
    assert "locality-only" in (out.stderr + out.stdout)
    assert "_local" in (out.stderr + out.stdout)
