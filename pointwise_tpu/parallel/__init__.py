from pointwise_tpu.parallel.mesh import make_mesh  # noqa: F401
from pointwise_tpu.parallel.spatial import spatial_pointwise_conv  # noqa: F401
