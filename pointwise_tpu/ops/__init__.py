from pointwise_tpu.ops.pointwise_conv import (  # noqa: F401
    pointwise_conv,
    pointwise_conv_counts,
)
from pointwise_tpu.ops.reference import pointwise_conv_reference  # noqa: F401
