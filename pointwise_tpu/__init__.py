"""pointwise_tpu — a TPU-native framework for Pointwise Convolutional Neural Networks.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
``hkust-vgd/pointwise`` (Pointwise CNNs, CVPR 2018): 3D point-cloud
classification (ModelNet40) and per-point semantic segmentation (SceneNN,
S3DIS sliding-block with overlap voting, ShapeNetPart), plus large-scan
streaming inference and SPMD scaling over TPU meshes.

The reference's custom C++ CPU TensorFlow operator (per-point radius neighbor
query -> 3x3x3 kernel-cell binning -> cell-wise feature averaging -> kernel
weight matmul) becomes a single fused Pallas TPU kernel built on masked MXU
matmuls, with a matching custom-VJP for training.

Layer map (SURVEY.md section 1):
    L4  CLI / configs        train.py / eval.py + dataclass configs
    L3  Models (flax.linen)  PointwiseClassifier, PointwiseSegmenter
    L2b Ops (JAX)            pointwise_conv custom_vjp; neighbor utilities
    L2a Kernels (Pallas)     fused bin-average-matmul fwd/bwd on the MXU
    L1  Data pipeline        jittable transforms; host->HBM prefetch
    L0  Runtime              jit/pjit + sharding over jax.sharding.Mesh
"""

__version__ = "0.1.0"

from pointwise_tpu.ops.pointwise_conv import pointwise_conv  # noqa: F401

# The rest of the user-facing surface resolves lazily: models pull in flax
# and the trainer pulls in optax/orbax, which library users of the bare op
# should not pay import time for.
_LAZY = {
    "PointwiseClassifier": "pointwise_tpu.models",
    "PointwiseSegmenter": "pointwise_tpu.models",
    "ShapeNetPartSegmenter": "pointwise_tpu.models",
    "Trainer": "pointwise_tpu.train.trainer",
    "stream_apply": "pointwise_tpu.streaming",
    "stream_apply_layered": "pointwise_tpu.streaming",
    "make_mesh": "pointwise_tpu.parallel",
    "init_distributed": "pointwise_tpu.parallel",
    "host_local_batch_to_global": "pointwise_tpu.parallel",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
