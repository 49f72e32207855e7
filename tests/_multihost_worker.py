"""Subprocess worker for the 2-process multi-host promotion test.

Run one Trainer step on a fixed global batch, either under a real
2-process ``jax.distributed`` runtime (each process holds 2 virtual CPU
devices and only ITS half of the batch, promoted through
``Trainer._promote_batch`` / ``jax.make_array_from_process_local_data``)
or single-process with all 4 devices and the full batch.  Dumps the step
loss and every post-step param leaf to ``--out`` (.npz) so the parent
test can assert the two worlds agree (SURVEY section 2 C13 DCN row;
VERDICT r4 missing #5 — the promotion path was only ever pinned as a
single-process no-op).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--port", default="29450")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS env vars (CLAUDE.md); the
    # config flag is the only reliable CPU force in a subprocess
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if args.nprocs > 1:
        from pointwise_tpu.parallel import init_distributed

        assert init_distributed(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nprocs,
            process_id=args.pid,
        )
        assert jax.process_count() == args.nprocs

    import jax.numpy as jnp
    import numpy as np

    import optax

    from pointwise_tpu.models import PointwiseClassifier
    from pointwise_tpu.parallel import make_mesh
    from pointwise_tpu.train.configs import OptimizerConfig
    from pointwise_tpu.train.trainer import Trainer

    assert jax.device_count() == 4, jax.devices()

    # identical GLOBAL batch + init on every process (same seeds)
    model = PointwiseClassifier(
        num_classes=4, channels=(8,), radii=(0.6,), head_dims=(16,),
        dropout_rate=0.0,
    )
    B, N = 8, 64
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    pts = np.asarray(
        jax.random.uniform(k[0], (B, N, 3), minval=-1, maxval=1))
    batch_global = {"points": pts,
                    "label": np.arange(B, dtype=np.int32) % 4}
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(pts),
                        train=False)["params"]

    def loss_fn(p, batch, rng, train):
        logits = model.apply({"params": p}, batch["points"], train=train,
                             rngs={"dropout": rng})
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()
        acc = (logits.argmax(-1) == batch["label"]).mean()
        return loss, {"acc": acc}

    trainer = Trainer(
        loss_fn, params,
        OptimizerConfig(warmup_steps=1, decay_steps=10),
        mesh=make_mesh(data=4), donate=False,
    )

    if args.nprocs > 1:
        # each process feeds only ITS contiguous row-slice of the global
        # batch — exactly the multi-host data-loading contract
        per = B // args.nprocs
        lo = args.pid * per
        batch = {k2: v[lo:lo + per] for k2, v in batch_global.items()}
    else:
        batch = batch_global

    metrics = trainer.step(batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    leaves = [np.asarray(x) for x in
              jax.tree.leaves(jax.device_get(trainer.state.params))]
    np.savez(args.out, loss=np.float64(loss),
             **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    print(f"proc {args.pid}/{args.nprocs}: loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
