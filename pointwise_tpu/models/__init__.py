from pointwise_tpu.models.layers import PointwiseConv, PointwiseConvBlock, masked_pool  # noqa: F401
from pointwise_tpu.models.classifier import (  # noqa: F401
    PointwiseClassifier,
    classification_loss,
    classification_loss_sums,
)
from pointwise_tpu.models.segmenter import (  # noqa: F401
    PointwiseSegmenter,
    ShapeNetPartSegmenter,
    segmentation_loss,
    segmentation_loss_sums,
)
