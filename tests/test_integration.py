"""Integration: tiny overfit runs (SURVEY.md section 4 tier 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointwise_tpu.data import synthetic
from pointwise_tpu.models import PointwiseClassifier, classification_loss
from pointwise_tpu.train.configs import OptimizerConfig
from pointwise_tpu.train.trainer import Trainer
from pointwise_tpu.utils import spatial


def test_classifier_overfits_tiny_set():
    pts, labels = synthetic.classification_set(0, 16, 64)
    pts = spatial.morton_sort_batch(pts)
    batch = {"points": jnp.asarray(pts), "label": jnp.asarray(labels)}

    model = PointwiseClassifier(
        num_classes=synthetic.NUM_CLASSES, channels=(16, 24),
        radii=(0.5, 1.0), head_dims=(32,), dropout_rate=0.0,
        impl="reference",
    )

    def loss_fn(p, b, rng, train):
        logits = model.apply({"params": p}, b["points"], train=False)
        loss, acc = classification_loss(logits, b["label"])
        return loss, {"accuracy": acc}

    params = model.init(jax.random.PRNGKey(0), batch["points"], train=False)[
        "params"
    ]
    opt = OptimizerConfig(learning_rate=3e-3, warmup_steps=5, decay_steps=200,
                          weight_decay=0.0)
    trainer = Trainer(loss_fn, params, opt)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(120):
        m = trainer.step(batch, rng)
        if first is None:
            first = float(m["loss"])
    final_loss = float(m["loss"])
    final_acc = float(m["accuracy"])
    assert final_loss < 0.25 * first, (first, final_loss)
    assert final_acc == 1.0, final_acc
