from pointwise_tpu.train.configs import (  # noqa: F401
    ClassificationConfig,
    SegmentationConfig,
    get_config,
)
from pointwise_tpu.train.trainer import TrainState, Trainer  # noqa: F401
