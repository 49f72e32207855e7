from pointwise_tpu.models.layers import PointwiseConv, PointwiseConvBlock, masked_pool  # noqa: F401
from pointwise_tpu.models.classifier import PointwiseClassifier, classification_loss  # noqa: F401
from pointwise_tpu.models.segmenter import (  # noqa: F401
    PointwiseSegmenter,
    ShapeNetPartSegmenter,
    segmentation_loss,
)
