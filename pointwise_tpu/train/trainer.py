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
    model_state: Any = None   # mutable collections (e.g. BatchNorm stats)

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.step, self.params, self.opt_state, self.model_state), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.model_state), None),
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

    Default contract: loss_fn(params, batch, rng, train) -> (loss, metrics).

    SPMD mode (``space_axis`` set): the whole step runs inside ``shard_map``
    over a (batch_axis, space_axis) mesh — batch dim sharded over
    ``batch_axis``, point dim over ``space_axis`` (the model must convolve
    with ``impl='spatial:<space_axis>'`` and, if it pools globally, set
    ``context_axes=(space_axis,)``).  Because a masked mean is not linear
    across shards, the loss contract becomes SUMS:

        loss_fn(params, batch, rng, train) -> (loss_sum, weight, metric_sums)

    where every value is the LOCAL shard's sum and ``weight`` its
    normalizer share (mask count / batch rows).  The trainer psums each
    across the mesh and divides, so loss/grads/metrics equal the unsharded
    global mean exactly.  ``rng`` is folded with the shard index along
    ``rng_axes`` (default: both mesh axes → per-shard-independent dropout;
    pass ``rng_axes=(batch_axis,)`` when the model's rng use is replicated
    across space shards, e.g. a classifier's post-pool head dropout);
    per-CLOUD geometric augmentation (e.g. one rotation per cloud) must
    happen on the host or key off the data index only — not inside a
    spatially-sharded loss_fn.

    Mutable model state (``model_state`` set, e.g. BatchNorm batch_stats):
    the loss contract becomes

        loss_fn(params, model_state, batch, rng, train)
            -> (loss, (metrics, new_model_state))

    The state threads through TrainState and checkpoints.  Under plain-jit
    data parallelism the batch-stat reductions see the GLOBAL batch (XLA
    inserts the collectives).  Combining model_state with ``space_axis``
    composes the contracts: the model must sync its BatchNorm moments over
    the mesh itself (``bn_axes=(batch_axis, space_axis)`` on the Flax
    modules — shard_map gives the axes names, flax pmean's over them) and

        loss_fn(params, model_state, batch, rng, train)
            -> (loss_sum, weight, (metric_sums, new_model_state))

    The synced new_model_state is identical on every shard, so it leaves
    the shard_map replicated.
    """

    def __init__(
        self,
        loss_fn: Callable,
        params,
        opt_cfg: OptimizerConfig,
        *,
        mesh: jax.sharding.Mesh | None = None,
        batch_axis: str = "data",
        space_axis: str | None = None,
        batch_specs: dict | None = None,
        model_state=None,
        donate: bool = True,
        rng_axes: tuple | None = None,
    ):
        self.tx = make_optimizer(opt_cfg)
        self.loss_fn = loss_fn
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.space_axis = space_axis
        self.batch_specs = batch_specs
        self.donate = donate
        # SPMD rng folding: which mesh axes distinguish the per-shard rng.
        # Default (both) gives independent dropout per shard — right for
        # per-point dropout on spatially-sharded features.  A model whose
        # ONLY rng use is replicated across space shards (e.g. a classifier's
        # post-pool head dropout: the pooled features are identical on every
        # space shard after the context psum) must fold the batch axis only
        # (rng_axes=(batch_axis,)), or each space shard draws a different
        # mask for the same replicated computation and the sharded step no
        # longer equals the unsharded one.
        self.rng_axes = rng_axes
        self.has_model_state = model_state is not None
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            model_state=model_state,
        )

        def train_step(state: TrainState, batch, rng):
            if self.has_model_state:
                def lf(p):
                    return loss_fn(p, state.model_state, batch, rng, True)
            else:
                def lf(p):
                    loss, metrics = loss_fn(p, batch, rng, True)
                    return loss, (metrics, None)
            (loss, (metrics, new_ms)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, model_state=new_ms),
                metrics,
            )

        def eval_step(state: TrainState, batch, rng):
            if self.has_model_state:
                _, (metrics, _) = loss_fn(state.params, state.model_state,
                                          batch, rng, False)
            else:
                _, metrics = loss_fn(state.params, batch, rng, False)
            return metrics

        if space_axis is not None:
            if mesh is None:
                raise ValueError("space_axis requires a mesh")
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            state = jax.device_put(state, repl)
            # steps are built lazily: the shard_map in_specs depend on the
            # batch structure, first seen at step()/evaluate() time.
            self._train_step = None
            self._eval_step = None
        elif mesh is not None:
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

    # ---- SPMD (data x space) steps ---------------------------------------

    def _spmd_specs(self, batch):
        from jax.sharding import PartitionSpec as P

        if self.batch_specs is not None:
            return dict(self.batch_specs)
        ba, sa = self.batch_axis, self.space_axis
        # default layout: (B, N, ...) arrays shard batch + point dims;
        # per-cloud arrays like (B,) labels shard the batch dim only.
        return {
            k: (P(ba, sa) if jnp.ndim(v) >= 2 else P(ba))
            for k, v in batch.items()
        }

    def _build_spmd_steps(self, batch):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, ba, sa = self.mesh, self.batch_axis, self.space_axis
        axes = (ba, sa)
        specs = self._spmd_specs(batch)
        loss_fn, tx = self.loss_fn, self.tx

        rng_axes = self.rng_axes if self.rng_axes is not None else axes

        def shard_rng(rng):
            idx = jnp.int32(0)
            for a in rng_axes:
                idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
            return jax.random.fold_in(rng, idx)

        def psum_mean(tree, total_w):
            return jax.tree.map(
                lambda v: jax.lax.psum(v, axes) / total_w, tree
            )

        has_ms = self.has_model_state

        def local_train(state, batch, rng):
            rng = shard_rng(rng)

            def lf(p):
                if has_ms:
                    loss_sum, w, (metric_sums, new_ms) = loss_fn(
                        p, state.model_state, batch, rng, True)
                else:
                    loss_sum, w, metric_sums = loss_fn(p, batch, rng, True)
                    new_ms = None
                return loss_sum, (w, metric_sums, new_ms)

            (loss_sum, (w, metric_sums, new_ms)), grads = jax.value_and_grad(
                lf, has_aux=True
            )(state.params)
            total_w = jax.lax.psum(w, axes)
            loss = jax.lax.psum(loss_sum, axes) / total_w
            grads = psum_mean(grads, total_w)
            metrics = dict(psum_mean(metric_sums, total_w))
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return (
                TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, model_state=new_ms),
                metrics,
            )

        def local_eval(state, batch, rng):
            rng = shard_rng(rng)
            if has_ms:
                loss_sum, w, (metric_sums, _) = loss_fn(
                    state.params, state.model_state, batch, rng, False)
            else:
                loss_sum, w, metric_sums = loss_fn(state.params, batch, rng,
                                                   False)
            total_w = jax.lax.psum(w, axes)
            metrics = dict(psum_mean(metric_sums, total_w))
            metrics["loss"] = jax.lax.psum(loss_sum, axes) / total_w
            # total_w rides along so evaluate() can weight this batch's means
            # when accumulating across batches (ragged masks / padded tails).
            return metrics, total_w

        # check_vma=False: the conv kernels are pallas_calls, and under
        # shard_map's varying-mesh-axes validation every pallas out_shape
        # would need an explicit `vma` annotation (jax raises exactly that,
        # suggesting check_vma=False).  The cross-shard semantics the check
        # would guard are pinned by the == unsharded tests instead
        # (tests/test_parallel.py).
        repl_p = P()
        repl = NamedSharding(mesh, repl_p)
        batch_sh = {k: NamedSharding(mesh, v) for k, v in specs.items()}
        self.batch_sharding = batch_sh
        self._train_step = jax.jit(
            jax.shard_map(
                local_train, mesh=mesh,
                in_specs=(repl_p, specs, repl_p),
                out_specs=(repl_p, repl_p),
                check_vma=False,
            ),
            in_shardings=(repl, batch_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if self.donate else (),
        )
        self._eval_step = jax.jit(
            jax.shard_map(
                local_eval, mesh=mesh,
                in_specs=(repl_p, specs, repl_p),
                out_specs=(repl_p, repl_p),
                check_vma=False,
            ),
            in_shardings=(repl, batch_sh, repl),
            out_shardings=(repl, repl),
        )

    def _promote_batch(self, batch):
        """Multi-host feeding: promote per-process host arrays to global
        ``jax.Array``s matching the step's batch shardings.  Under
        ``parallel.init_distributed()`` each process loads only its slice of
        the global batch; the jitted step's in_shardings describe the GLOBAL
        array.  No-op single-process or mesh-less (jit shards plain host
        arrays directly), so every caller stays pod-ready for free.
        """
        if self.mesh is None or jax.process_count() == 1:
            return batch
        import numpy as np

        mk = jax.make_array_from_process_local_data
        sh = self.batch_sharding
        if isinstance(sh, dict):
            return {k: mk(sh[k], np.asarray(v)) for k, v in batch.items()}
        return jax.tree.map(lambda a: mk(sh, np.asarray(a)), batch)

    def step(self, batch, rng):
        if self._train_step is None:
            self._build_spmd_steps(batch)
        self.state, metrics = self._train_step(
            self.state, self._promote_batch(batch), rng)
        return metrics

    def evaluate(self, batches, rng, weight_fn=None):
        """WEIGHTED mean metrics over an iterable of batches.

        Each batch's per-batch means are weighted by the batch's true
        normalizer — the mask count when the batch carries a ``mask`` (seg
        blocks, padded tails), the row count otherwise; under SPMD the
        eval step reports its psum'd global weight.  The result is the exact
        global masked mean, matching the train-side sums contract (a plain
        mean of per-batch means over-weights near-empty batches).

        CONTRACT of the mask heuristic: every metric the loss_fn returns
        must be a mean over the SAME normalizer the weight uses (per-point
        masked means when ``mask`` is present).  A metric with a different
        normalizer (e.g. a per-cloud accuracy inside a masked batch) would
        be mis-weighted — pass ``weight_fn(batch) -> float`` to override the
        heuristic with the correct per-batch weight (non-SPMD path only;
        the SPMD path always uses the loss_fn's own psum'd weight).
        """
        total, wsum = {}, 0.0
        for batch in batches:
            if self._eval_step is None:
                self._build_spmd_steps(batch)
            out = self._eval_step(self.state, self._promote_batch(batch), rng)
            if self.space_axis is not None:
                m, w = jax.device_get(out)
                w = float(w)
            else:
                m = jax.device_get(out)
                if weight_fn is not None:
                    w = float(weight_fn(batch))
                elif isinstance(batch, dict) and "mask" in batch:
                    w = float(jnp.sum(batch["mask"]))
                else:
                    first = next(iter(batch.values())) if isinstance(batch, dict) else batch
                    w = float(jnp.shape(first)[0])
            for k, v in m.items():
                total[k] = total.get(k, 0.0) + float(v) * w
            wsum += w
        if not total:
            # e.g. a heldout split smaller than the batch size with
            # drop_remainder — logging all-zero "metrics" would silently
            # pass for a real evaluation
            raise ValueError(
                "evaluate() received no batches — eval split smaller than "
                "the batch size with drop_remainder, or an empty iterator")
        return {k: v / max(wsum, 1e-9) for k, v in total.items()}

    # ---- checkpointing (orbax) ------------------------------------------

    def save_checkpoint(self, directory: str, keep: int = 3, extra=None):
        """extra: optional pytree of extra training-loop state (e.g. the
        base PRNG key) saved alongside {step, params, opt_state} — SURVEY.md
        section 5 checkpoint row."""
        import orbax.checkpoint as ocp

        step = int(jax.device_get(self.state.step))
        mngr = ocp.CheckpointManager(
            directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
        )
        payload = _to_pure(self.state)
        if extra is not None:
            payload["extra"] = jax.device_get(extra)
        mngr.save(step, args=ocp.args.StandardSave(payload))
        mngr.wait_until_finished()
        mngr.close()
        return step

    def restore_checkpoint(self, directory: str, step: int | None = None,
                           extra=None) -> int:
        """extra: template pytree for extra loop state; the restored value
        lands in ``self.restored_extra`` (None if the checkpoint predates
        extra-state saving)."""
        import orbax.checkpoint as ocp

        # item_handlers lets a FRESH manager read the checkpoint's structure
        # (item_metadata) before any restore registers a handler.
        mngr = ocp.CheckpointManager(
            directory, item_handlers=ocp.StandardCheckpointHandler()
        )
        step = mngr.latest_step() if step is None else step
        self.restored_extra = None
        if step is None:
            return 0
        import numpy as np

        target = _to_pure(self.state)
        target["extra"] = jax.device_get(extra) if extra is not None else {
            "rng_base": np.zeros(2, np.uint32)
        }
        # Orbax's strict matching cannot ignore template keys the on-disk
        # checkpoint lacks, so probe the checkpoint's STRUCTURE (its metadata
        # tree) and shape the restore template to it: a pre-extra-state
        # checkpoint drops 'extra', a norm!='batch'-era checkpoint restored
        # into a BatchNorm trainer drops 'model_state' (keeping the
        # initialized batch_stats).  Structural, not exception-message-based:
        # real failures (I/O, dtype corruption) still surface from restore().
        try:
            on_disk = set(mngr.item_metadata(step).keys())
        except Exception:
            on_disk = None   # metadata unreadable: attempt the full template
        if on_disk is not None:
            for opt_key in ("extra", "model_state"):
                if opt_key in target and opt_key not in on_disk:
                    target.pop(opt_key)
        restored = mngr.restore(step, args=ocp.args.StandardRestore(target))
        mngr.close()
        self.restored_extra = restored.get("extra")
        self.state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            opt_state=jax.tree.map(
                lambda t, r: jnp.asarray(r, t.dtype) if hasattr(t, "dtype") else r,
                self.state.opt_state,
                restored["opt_state"],
            ),
            model_state=restored.get("model_state",
                                     self.state.model_state),
        )
        return int(step)


def _to_pure(state: TrainState):
    params = state.params
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    out = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if state.model_state is not None:
        ms = state.model_state
        if isinstance(ms, FrozenDict):
            ms = ms.unfreeze()
        out["model_state"] = jax.device_get(ms)
    return out


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
