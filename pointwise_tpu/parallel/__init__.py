from pointwise_tpu.parallel.mesh import (  # noqa: F401
    host_local_batch_to_global,
    init_distributed,
    make_mesh,
)
from pointwise_tpu.parallel.spatial import spatial_pointwise_conv  # noqa: F401
