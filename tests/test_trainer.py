"""Trainer subsystem tests: checkpoint/resume round-trip, metrics, guards."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointwise_tpu.models import PointwiseClassifier, classification_loss
from pointwise_tpu.train.configs import OptimizerConfig
from pointwise_tpu.train.trainer import Trainer


def _setup(seed=0):
    model = PointwiseClassifier(
        num_classes=4, channels=(8,), radii=(0.6,), head_dims=(16,),
        impl="reference", dropout_rate=0.0,
    )
    pts = jax.random.uniform(jax.random.PRNGKey(seed), (4, 32, 3),
                             minval=-1, maxval=1)
    batch = {"points": pts, "label": jnp.arange(4) % 4}

    def loss_fn(p, b, rng, train):
        logits = model.apply({"params": p}, b["points"], train=False)
        loss, acc = classification_loss(logits, b["label"])
        return loss, {"accuracy": acc}

    params = model.init(jax.random.PRNGKey(1), pts, train=False)["params"]
    return loss_fn, params, batch


def test_checkpoint_resume_roundtrip(tmp_path):
    loss_fn, params, batch = _setup()
    opt = OptimizerConfig(warmup_steps=1, decay_steps=100)
    rng = jax.random.PRNGKey(2)
    ckdir = os.fspath(tmp_path / "ck")

    t1 = Trainer(loss_fn, params, opt, donate=False)
    for _ in range(3):
        t1.step(batch, rng)
    t1.save_checkpoint(ckdir)
    # continue 2 more steps on the original
    for _ in range(2):
        t1.step(batch, rng)
    ref_params = jax.device_get(t1.state.params)

    # restore at step 3 and replay the same 2 steps
    loss_fn2, params2, _ = _setup()
    t2 = Trainer(loss_fn2, params2, opt, donate=False)
    assert t2.restore_checkpoint(ckdir) == 3
    assert int(t2.state.step) == 3
    for _ in range(2):
        t2.step(batch, rng)
    got = jax.device_get(t2.state.params)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cli_resume_bitwise_identical(tmp_path):
    """Full-fidelity resume (SURVEY.md section 5 checkpoint row): a
    killed-and-resumed CLI run must replay the uninterrupted run exactly —
    same per-step rng (fold_in by step), same data order (epoch/offset
    derived from step), params bitwise-equal at the end."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")

    def run(extra, ckdir):
        out = subprocess.run(
            [sys.executable, "train.py", "--config", "cls_tiny",
             "--checkpoint-dir", os.fspath(ckdir)] + extra,
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return {
            rec["step"]: rec for rec in map(json.loads, (
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            )) if "loss" in rec
        }

    m_full = run(["--steps", "5"], tmp_path / "a")          # uninterrupted
    run(["--steps", "3"], tmp_path / "b")                   # "killed" at 3
    m_res = run(["--steps", "5", "--resume"], tmp_path / "b")
    for s in (4, 5):
        assert m_full[s]["loss"] == m_res[s]["loss"], (s, m_full[s], m_res[s])
        assert m_full[s]["grad_norm"] == m_res[s]["grad_norm"]

    # final params bitwise-identical across the two checkpoint dirs
    from pointwise_tpu.data import synthetic
    from pointwise_tpu.models import PointwiseClassifier

    # the CLI swaps in the synthetic dataset's class count
    model = PointwiseClassifier(num_classes=synthetic.NUM_CLASSES,
                                channels=(8, 8), radii=(0.5, 1.0),
                                head_dims=(16,), impl="reference")
    pts = jnp.zeros((1, 64, 3))
    p0 = model.init(jax.random.PRNGKey(0), pts, train=False)["params"]
    opt = OptimizerConfig()
    ta = Trainer(lambda p, b, r, t: (jnp.zeros(()), {}), p0, opt, donate=False)
    tb = Trainer(lambda p, b, r, t: (jnp.zeros(()), {}),
                 jax.tree.map(jnp.copy, p0), opt, donate=False)
    assert ta.restore_checkpoint(os.fspath(tmp_path / "a")) == 5
    assert tb.restore_checkpoint(os.fspath(tmp_path / "b")) == 5
    for a, b in zip(jax.tree.leaves(ta.state.params),
                    jax.tree.leaves(tb.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_extra_payload_roundtrip(tmp_path):
    # the PRNG base key travels with the checkpoint and restores intact;
    # restoring WITHOUT an extra template still works (back-compat).
    loss_fn, params, batch = _setup()
    opt = OptimizerConfig(warmup_steps=1, decay_steps=100)
    ckdir = os.fspath(tmp_path / "ck")
    t1 = Trainer(loss_fn, params, opt, donate=False)
    t1.step(batch, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    t1.save_checkpoint(ckdir, extra={"rng_base": jax.device_get(key)})

    loss_fn2, params2, _ = _setup()
    t2 = Trainer(loss_fn2, params2, opt, donate=False)
    t2.restore_checkpoint(ckdir, extra={"rng_base": jax.device_get(
        jax.random.PRNGKey(0))})
    np.testing.assert_array_equal(np.asarray(t2.restored_extra["rng_base"]),
                                  np.asarray(key))
    # no template: the default rng_base probe still recovers the key
    loss_fn3, params3, _ = _setup()
    t3 = Trainer(loss_fn3, params3, opt, donate=False)
    assert t3.restore_checkpoint(ckdir) == 1
    np.testing.assert_array_equal(np.asarray(t3.restored_extra["rng_base"]),
                                  np.asarray(key))

    # checkpoints saved WITHOUT extra restore fine (fallback path)
    ckdir2 = os.fspath(tmp_path / "ck2")
    t1.save_checkpoint(ckdir2)
    loss_fn4, params4, _ = _setup()
    t4 = Trainer(loss_fn4, params4, opt, donate=False)
    assert t4.restore_checkpoint(ckdir2) == 1
    assert t4.restored_extra is None


def test_training_stays_finite():
    # NaN guard (SURVEY.md section 5 sanitizer row): a few steps at a high
    # LR must keep loss/grads finite thanks to grad clipping.
    loss_fn, params, batch = _setup()
    opt = OptimizerConfig(learning_rate=0.3, warmup_steps=1, decay_steps=10,
                          grad_clip=1.0)
    t = Trainer(loss_fn, params, opt, donate=False)
    rng = jax.random.PRNGKey(3)
    for _ in range(5):
        m = t.step(batch, rng)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))
    for leaf in jax.tree.leaves(jax.device_get(t.state.params)):
        assert np.all(np.isfinite(leaf))


def test_grad_clip_in_optimizer_chain():
    # the global-norm clip really gates the optimizer: a huge gradient and
    # the same gradient pre-scaled to the clip norm produce identical
    # updates (so the clip, not adam's scale-invariance, did the work).
    import optax

    from pointwise_tpu.train.trainer import make_optimizer

    cfg = OptimizerConfig(grad_clip=1.0, warmup_steps=1, decay_steps=10,
                          weight_decay=0.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    huge = {"w": jnp.full((4, 4), 1e6), "b": jnp.full((4,), -3e6)}
    norm = optax.global_norm(huge)
    clipped = jax.tree.map(lambda g: g / norm, huge)   # global norm == 1.0

    u1, _ = tx.update(huge, tx.init(params), params)
    u2, _ = tx.update(clipped, tx.init(params), params)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # sanity: a below-threshold gradient passes through unclipped — its
    # SECOND-moment state differs from the clipped-huge one's
    tiny = jax.tree.map(lambda g: g * 1e-3, clipped)   # norm 1e-3 < clip
    _, s3 = tx.update(tiny, tx.init(params), params)
    _, s1 = tx.update(huge, tx.init(params), params)
    nu3 = optax.global_norm(jax.tree.leaves(s3[1][0].nu))
    nu1 = optax.global_norm(jax.tree.leaves(s1[1][0].nu))
    assert float(nu3) < float(nu1)


def test_eval_metrics_average():
    loss_fn, params, batch = _setup()
    t = Trainer(loss_fn, params, OptimizerConfig(), donate=False)
    out = t.evaluate([batch, batch], jax.random.PRNGKey(0))
    assert set(out) == {"accuracy"}
    assert 0.0 <= out["accuracy"] <= 1.0


def test_eval_weighted_by_mask_counts():
    """evaluate() must return the GLOBAL masked mean when batches carry
    ragged masks — a 2-real-point batch must not weigh like a full one
    (VERDICT r2 weak #3)."""
    params = {"w": jnp.ones(())}

    def loss_fn(p, b, rng, train):
        m = b["mask"]
        acc = jnp.sum(b["value"] * m) / jnp.maximum(jnp.sum(m), 1.0)
        return jnp.zeros(()), {"metric": acc}

    # batch A: 4 real points of value 1.0; batch B: 1 real point of value 0.0
    ba = {"value": jnp.ones((1, 4)), "mask": jnp.ones((1, 4))}
    bb = {"value": jnp.zeros((1, 4)),
          "mask": jnp.array([[1.0, 0.0, 0.0, 0.0]])}
    t = Trainer(loss_fn, params, OptimizerConfig(), donate=False)
    out = t.evaluate([ba, bb], jax.random.PRNGKey(0))
    # global masked mean = (4*1 + 1*0) / 5 = 0.8 (an unweighted mean of
    # per-batch means would report 0.5)
    np.testing.assert_allclose(out["metric"], 0.8, rtol=1e-6)


def test_restore_model_state_fallback(tmp_path):
    """A norm='batch' trainer restoring a checkpoint saved WITHOUT a
    model_state entry must keep its initialized batch_stats and restore the
    rest (ADVICE r2: structural template shaping, not exception matching)."""
    loss_fn, params, batch = _setup()
    opt = OptimizerConfig(warmup_steps=1, decay_steps=100)
    ckdir = os.fspath(tmp_path / "ck")
    t1 = Trainer(loss_fn, params, opt, donate=False)   # stateless trainer
    t1.step(batch, jax.random.PRNGKey(0))
    t1.save_checkpoint(ckdir)

    def loss_fn_ms(p, ms, b, rng, train):
        loss, metrics = loss_fn(p, b, rng, train)
        return loss, (metrics, ms)

    loss_fn2, params2, _ = _setup()
    ms0 = {"mean": jnp.full((3,), 7.0)}
    t2 = Trainer(loss_fn_ms, params2, opt, donate=False, model_state=ms0)
    assert t2.restore_checkpoint(ckdir) == 1
    np.testing.assert_array_equal(
        np.asarray(t2.state.model_state["mean"]), np.full((3,), 7.0))
    for a, b in zip(jax.tree.leaves(jax.device_get(t1.state.params)),
                    jax.tree.leaves(jax.device_get(t2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_weight_fn_override():
    # evaluate()'s heuristic weights per-batch means by sum(mask) whenever a
    # mask key exists — only correct for per-point masked means.  A
    # per-CLOUD metric must override the weight with weight_fn (the
    # documented escape hatch); this pins both arms of that contract.
    def loss_fn(params, batch, rng, train):
        return jnp.zeros(()), {"v": jnp.mean(batch["v"])}

    tr = Trainer(loss_fn, {"w": jnp.zeros(())}, OptimizerConfig(),
                 donate=False)
    batches = [
        {"v": np.full((2,), 1.0, np.float32),
         "mask": np.ones((2, 7), np.float32)},
        {"v": np.full((6,), 4.0, np.float32),
         "mask": np.ones((6, 1), np.float32)},
    ]
    # mask heuristic: weights 14 vs 6 -> (1*14 + 4*6)/20
    m = tr.evaluate(iter(batches), jax.random.PRNGKey(0))
    np.testing.assert_allclose(m["v"], 1.9, rtol=1e-6)
    # per-cloud override: weights 2 vs 6 -> (1*2 + 4*6)/8
    m = tr.evaluate(iter(batches), jax.random.PRNGKey(0),
                    weight_fn=lambda b: len(b["v"]))
    np.testing.assert_allclose(m["v"], 3.25, rtol=1e-6)
