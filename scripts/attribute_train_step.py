"""Device-plane attribution of the full classification train step.

bench.py's headline train step (ModelNet40 config: B=32, N=1024, 4 conv
layers + FC head + adamw) measures ~19.4 ms while one fused conv op at
B=64/N=1024 costs 9.56 ms fwd+bwd on the device plane — i.e. the four
B=32 convs account for roughly the same device time, and the question is
where the REMAINDER goes (head matmuls, optimizer, layout ops, or bubbles).

This script traces the trainer step (same construction as
bench.bench_train_step) and aggregates the device-plane OP lines by event
name, printing the top ops plus the module-line total, so the step's
composition is measured instead of guessed.  Run on the real chip:

    python scripts/attribute_train_step.py [--steps 8]

Methodology matches pointwise_tpu.utils.runtime.profile_device_time (module
line identified by its jit_ events; op lines aggregated separately); the op
lines of a device plane are non-overlapping sequences, so their per-name
totals sum to <= the module total, and the gap is scheduling bubbles.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cls_trainer():
    """bench.bench_train_step's construction (B=32, N=1024 classifier)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointwise_tpu.data import synthetic
    from pointwise_tpu.models import PointwiseClassifier, classification_loss
    from pointwise_tpu.train.configs import OptimizerConfig
    from pointwise_tpu.train.trainer import Trainer
    from pointwise_tpu.utils import spatial

    B, N = 32, 1024
    model = PointwiseClassifier(num_classes=40)
    pts, _ = synthetic.classification_set(0, B, N)
    pts = spatial.morton_sort_batch(pts)
    batch = {
        "points": jnp.asarray(pts),
        "label": jnp.asarray(np.random.RandomState(0).randint(0, 40, B)),
    }

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            {"params": params}, batch["points"], train=train,
            rngs={"dropout": rng},
        )
        loss, acc = classification_loss(logits, batch["label"])
        return loss, {"acc": acc}

    params = jax.jit(
        lambda r: model.init(r, batch["points"], train=False)
    )(jax.random.PRNGKey(0))["params"]
    # donate=False: the traced loop reuses `batch` across iterations
    trainer = Trainer(loss_fn, params, OptimizerConfig(), donate=False)
    return trainer, batch, B * N


def build_seg_trainer(B=8, N=4096):
    """bench.bench_seg_step's construction (S3DIS config: B=8, N=4096,
    6 conv layers + dense skip + global context) — VERDICT r4 task 1: the
    most expensive production step had no device-plane attribution."""
    import jax
    import jax.numpy as jnp

    from pointwise_tpu.data import s3dis
    from pointwise_tpu.models import PointwiseSegmenter, segmentation_loss
    from pointwise_tpu.train.configs import OptimizerConfig, SegmentationConfig
    from pointwise_tpu.train.trainer import Trainer

    cfg = SegmentationConfig(name="bench", num_classes=5, batch_size=B,
                             num_points=N)
    blocks = s3dis.training_blocks(cfg)
    batch = {k: jnp.asarray(v[:B]) for k, v in blocks.items() if k != "index"}
    model = PointwiseSegmenter(
        num_classes=cfg.num_classes, channels=cfg.channels, radii=cfg.radii,
        head_dims=cfg.head_dims, dropout_rate=cfg.dropout,
    )

    def loss_fn(params, b, rng, train):
        logits = model.apply({"params": params}, b["points"], b["features"],
                             b["mask"], train=train, rngs={"dropout": rng})
        loss, acc = segmentation_loss(logits, b["label"], b["mask"])
        return loss, {"acc": acc}

    params = jax.jit(
        lambda r: model.init(r, batch["points"], batch["features"],
                             batch["mask"], train=False)
    )(jax.random.PRNGKey(0))["params"]
    trainer = Trainer(loss_fn, params, OptimizerConfig(), donate=False)
    return trainer, batch, B * N


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("cls", "seg"), default="cls")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/pw_attr_train")
    ap.add_argument("--batch", type=int, default=None,
                    help="seg only: override batch size")
    ap.add_argument("--points", type=int, default=None,
                    help="seg only: override points per block")
    args = ap.parse_args()

    import jax

    from pointwise_tpu.utils.runtime import enable_compile_cache, sync

    enable_compile_cache()

    if args.config == "seg":
        kw = {}
        if args.batch:
            kw["B"] = args.batch
        if args.points:
            kw["N"] = args.points
        trainer, batch, pts_per_step = build_seg_trainer(**kw)
    else:
        trainer, batch, pts_per_step = build_cls_trainer()
    rng = jax.random.PRNGKey(1)

    sync(trainer.step(batch, rng))  # compile before tracing

    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    try:
        m = None
        for _ in range(args.steps):
            m = trainer.step(batch, rng)
        jax.device_get(jax.tree.leaves(m)[0])
    finally:
        jax.profiler.stop_trace()

    files = sorted(glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit("no xplane.pb produced")
    pd = jax.profiler.ProfileData.from_file(files[-1])

    module_total = 0.0
    op_totals: dict[str, float] = collections.defaultdict(float)
    op_lines = 0
    for plane in pd.planes:
        if not plane.name.startswith("/device:"):
            continue
        # module accounting = the shared library rule (ADVICE r4 fixed a
        # mixed-line inflation here; one copy lives in utils.runtime now)
        from pointwise_tpu.utils.runtime import plane_jit_ns

        plane_module = plane_jit_ns(plane)
        for line in plane.lines:
            events = list(line.events)
            if not events:
                continue
            if any(e.name.startswith("jit") for e in events):
                continue   # module line — counted via plane_jit_ns above
            elif "async" in line.name.lower() or "copy" in line.name.lower():
                # async-copy events overlap each other; skip (GOLDEN r4)
                continue
            elif all(e.name.isdigit() for e in events):
                continue  # step-marker line (events named "0".."7")
            else:
                op_lines += 1
                for e in events:
                    op_totals[e.name] += e.duration_ns
        module_total += plane_module
    per = 1e-6 / args.steps  # ns -> ms/call
    print(f"module line total: {module_total * per:.3f} ms/step "
          f"({args.steps} steps, {op_lines} op lines) -> "
          f"{pts_per_step / (module_total * per * 1e-3):,.0f} pts/s device")
    ranked = sorted(op_totals.items(), key=lambda kv: -kv[1])
    covered = sum(op_totals.values())
    print(f"op lines total:    {covered * per:.3f} ms/step")
    for name, ns in ranked[: args.top]:
        print(f"  {ns * per:8.3f} ms  {100 * ns / max(covered, 1):5.1f}%  "
              f"{name[:90]}")

    # rollup: classify the Pallas conv custom-calls by their result spec —
    # fwd saves the counts alongside the features (tuple result), dW's
    # result is the (27, cin_p, cout_p) weight grad, dX's is point-shaped.
    # Two namings occur: bare %custom-call ops carry "PointwiseConv", but
    # under the runtime CSR density gate each kernel is wrapped in a
    # lax.cond -> the op line shows a %conditional event AND a nested
    # %branch_{0,1}_fun line for the taken arm (branch_0 = CSR tables
    # operand s32[...], branch_1 = dense fallback).  Count the branch/bare
    # events and SKIP the conditional wrappers (their duration covers the
    # nested branch — counting both double-reports, seg r5 finding).
    groups = collections.defaultdict(float)
    for name, ns in op_totals.items():
        op = name.split(" = ", 1)[0]
        res = name.split(" = ", 1)[-1]
        if op.startswith("%conditional"):
            groups["(cond wrappers, excluded from total)"] += ns
            continue
        if "PointwiseConv" in name or op.startswith(("%branch_0_fun",
                                                     "%branch_1_fun")):
            arm = (" [csr]" if op.startswith("%branch_0_fun")
                   else " [dense]" if op.startswith("%branch_1_fun") else "")
            # dW may ride in a tuple with the density-gate scalar, so key on
            # the (27, cin_p, cout_p) weight shape anywhere in the result
            if "f32[27," in res or "bf16[27," in res:
                groups["conv dW kernels" + arm] += ns
            elif res.startswith("("):
                groups["conv fwd kernels" + arm] += ns
            else:
                groups["conv dX kernels" + arm] += ns
        else:
            groups["everything else (head/loss/adamw/layout)"] += ns
    print("rollup:")
    for name, ns in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {ns * per:8.3f} ms  {100 * ns / max(covered, 1):5.1f}%  "
              f"{name}")


if __name__ == "__main__":
    main()
