from facedet_tpu.parallel.mesh import create_mesh
from facedet_tpu.parallel.sharding import (
    batch_sharding,
    fsdp_param_shardings,
    tile_sharding,
)
