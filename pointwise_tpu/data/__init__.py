from pointwise_tpu.data import augment  # noqa: F401
from pointwise_tpu.data import synthetic  # noqa: F401
