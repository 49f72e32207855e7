from pointwise_tpu.kernels.pointwise_conv_pallas import (  # noqa: F401
    PwConvSpec,
    pointwise_conv_pallas,
)
