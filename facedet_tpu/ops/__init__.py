from facedet_tpu.ops.nms import merge_detections, nms
from facedet_tpu.ops.tiler import (
    TileGrid,
    adaptive_slice_size,
    compute_slice_grid,
    gather_tiles,
)
from facedet_tpu.ops.crop_resize import crop_and_resize
