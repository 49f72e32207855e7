"""Training runtime: jitted steps, optimizer, checkpoints, metrics.

Rebuild of the reference's per-workload `train()` / `train_one_epoch` /
`eval_one_epoch` session loops (SURVEY.md C10) as one generic trainer:

  * one jitted, donated `train_step` (augmentation + fwd + bwd + optax
    update fused into a single XLA program — no per-step Python in the
    reference's feed_dict style);
  * optax adamw with warmup+cosine decay and global-norm clipping
    (reference: Adam + staircase LR decay);
  * orbax checkpoints of {params, opt_state, step} with keep-last-k
    (reference: tf.train.Saver);
  * structured JSONL metrics to stdout (reference: console prints /
    tf.summary).

Data parallelism: pass a `jax.sharding.Mesh` and the trainer shards the
batch over the 'data' axis with replicated params (SURVEY.md C12/C13 —
XLA collectives over ICI, no external comm backend).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from pointwise_tpu.train.configs import OptimizerConfig


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.step, self.params, self.opt_state), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=cfg.learning_rate * 0.01,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.decay_steps,
        end_value=cfg.learning_rate * cfg.min_lr_ratio,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay),
    )


class Trainer:
    """Generic jitted trainer around (loss_fn, params).

    loss_fn(params, batch, rng, train) -> (loss, metrics dict).
    """

    def __init__(
        self,
        loss_fn: Callable,
        params,
        opt_cfg: OptimizerConfig,
        *,
        mesh: jax.sharding.Mesh | None = None,
        batch_axis: str = "data",
        donate: bool = True,
    ):
        self.tx = make_optimizer(opt_cfg)
        self.loss_fn = loss_fn
        self.mesh = mesh
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

        def train_step(state: TrainState, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng, True
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                metrics,
            )

        def eval_step(params, batch, rng):
            _, metrics = loss_fn(params, batch, rng, False)
            return metrics

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P(batch_axis))
            self.batch_sharding = data
            state = jax.device_put(state, repl)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,) if donate else (),
            )
            self._eval_step = jax.jit(
                eval_step, in_shardings=(repl, data, repl), out_shardings=repl
            )
        else:
            self.batch_sharding = None
            self._train_step = jax.jit(
                train_step, donate_argnums=(0,) if donate else ()
            )
            self._eval_step = jax.jit(eval_step)
        self.state = state

    def step(self, batch, rng):
        self.state, metrics = self._train_step(self.state, batch, rng)
        return metrics

    def evaluate(self, batches, rng):
        """Mean metrics over an iterable of batches."""
        total, count = {}, 0
        for batch in batches:
            m = jax.device_get(self._eval_step(self.state.params, batch, rng))
            for k, v in m.items():
                total[k] = total.get(k, 0.0) + float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in total.items()}

    # ---- checkpointing (orbax) ------------------------------------------

    def save_checkpoint(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        step = int(jax.device_get(self.state.step))
        mngr = ocp.CheckpointManager(
            directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
        )
        mngr.save(step, args=ocp.args.StandardSave(_to_pure(self.state)))
        mngr.wait_until_finished()
        mngr.close()
        return step

    def restore_checkpoint(self, directory: str, step: int | None = None) -> int:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(directory)
        step = mngr.latest_step() if step is None else step
        if step is None:
            return 0
        target = _to_pure(self.state)
        restored = mngr.restore(step, args=ocp.args.StandardRestore(target))
        mngr.close()
        self.state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            opt_state=jax.tree.map(
                lambda t, r: jnp.asarray(r, t.dtype) if hasattr(t, "dtype") else r,
                self.state.opt_state,
                restored["opt_state"],
            ),
        )
        return int(step)


def _to_pure(state: TrainState):
    params = state.params
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    return {
        "step": jax.device_get(state.step),
        "params": jax.device_get(params),
        "opt_state": jax.device_get(state.opt_state),
    }


class SummaryWriter:
    """Optional TensorBoard scalars (tf.summary), mirroring the reference's
    tf.summary logging; no-op when TensorFlow is unavailable."""

    def __init__(self, logdir: str | None):
        self._writer = None
        if logdir:
            try:
                import tensorflow as tf  # installed in this image

                self._writer = tf.summary.create_file_writer(logdir)
            except Exception:
                self._writer = None

    def scalars(self, step: int, metrics: dict, prefix: str = ""):
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            for k, v in metrics.items():
                try:
                    tf.summary.scalar(prefix + k, float(v), step=step)
                except (TypeError, ValueError):
                    pass
        self._writer.flush()


def log_metrics(step: int, metrics: dict, *, t0: float | None = None, extra=None,
                writer: "SummaryWriter | None" = None, prefix: str = ""):
    rec = {"step": step}
    rec.update({k: float(v) for k, v in metrics.items()})
    if t0 is not None:
        rec["elapsed_s"] = round(time.time() - t0, 3)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    if writer is not None:
        writer.scalars(step, metrics, prefix)
