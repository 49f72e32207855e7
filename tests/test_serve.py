"""Keep-alive serving CLI (`infer.py --serve`) — subprocess protocol test.

The serve loop is the round-4 serving deliverable (GOLDEN.md "serving
path"): programs warm once per process, then every stdin request streams at
the engine's steady state.  This pins the JSONL protocol end to end on the
CPU backend: ready handshake, scene-file inference with .pred.npy output +
accuracy, error replies that do NOT kill the server, deterministic repeat
replies (profile-covered schedules -> identical programs), and length-
profile persistence (``--profile-file`` round-trips through
infer.load_profiles).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
@pytest.mark.parametrize("extra", [[], ["--dp"]],
                         ids=["single", "data_parallel"])
def test_infer_serve_keepalive(tmp_path, extra):
    # --dp: serve() must wire the mesh like the one-shot path (tile batches
    # sharded over 'data' on the 8-device CPU mesh the subprocess inherits
    # via XLA_FLAGS) — it used to silently accept and ignore the flag.
    rng = np.random.RandomState(0)
    n = 2000
    xyz = rng.uniform(0.0, 2.5, (n, 3)).astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    lab = rng.randint(0, 5, n).astype(np.float32)
    room_path = tmp_path / "room.npy"
    np.save(room_path, np.concatenate([xyz, rgb, lab[:, None]], axis=1))
    prof_path = tmp_path / "profiles.json"

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    requests = "\n".join([
        str(room_path),
        "does_not_exist.npy",   # error reply; the server must keep going
        str(room_path),         # identical request -> identical reply
        "quit",
    ]) + "\n"
    out = subprocess.run(
        [sys.executable, "infer.py", "--config", "seg_tiny_stream",
         "--serve", "--warm-points", "0",
         "--profile-file", os.fspath(prof_path),
         "--tile-size", "1.5", "--tile-batch", "2"] + extra,
        input=requests, capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    assert lines and lines[0].get("ready") is True, lines[:1]
    replies = lines[1:]
    assert len(replies) == 3, out.stdout

    first, bad, second = replies
    assert first["scene"] == str(room_path)
    assert first["n_points"] == n
    assert first["pts_per_s"] > 0
    # labels were in the file -> metrics in the reply
    assert 0.0 <= first["accuracy"] <= 1.0 and 0.0 <= first["miou"] <= 1.0
    pred = np.load(first["output"])
    assert pred.shape == (n,) and pred.dtype == np.int32
    assert pred.min() >= 0 and pred.max() < 5

    assert "error" in bad and bad["scene"] == "does_not_exist.npy"

    # keep-alive determinism: the warmed profile covers the repeat request,
    # so the same programs rerun and the predictions are identical
    assert second["accuracy"] == first["accuracy"]
    assert second["miou"] == first["miou"]

    # compile visibility (VERDICT r4 task 9): the first request builds the
    # bucket-group programs (no warm-up ran), the profile-covered repeat
    # request must NOT — an operator can see a mid-request compile stall
    assert first["compiled"] is True and first["new_programs"] >= 1
    assert second["compiled"] is False and second["new_programs"] == 0
    assert second["compile_s"] == 0.0

    # --profile-file persisted something a restarted server can load
    sys.path.insert(0, os.getcwd())
    try:
        from infer import load_profiles
    finally:
        sys.path.pop(0)
    profiles = load_profiles(os.fspath(prof_path))
    assert profiles, "length profiles must be persisted"
    for b, (tbs, lengths) in profiles.items():
        assert isinstance(b, int) and tbs >= 1
        assert all(isinstance(x, int) and x > 0 for x in lengths)
