from pointwise_tpu.ops.pointwise_conv import pointwise_conv  # noqa: F401
from pointwise_tpu.ops.reference import pointwise_conv_reference  # noqa: F401
