from xpt_mde_tpu.ops.camera import (
    pixel_grid,
    scale_intrinsics,
    pixel2cam,
    cam2pixel,
    transform_to_source,
    reproject_pixel_coords,
)
from xpt_mde_tpu.ops.warp import bilinear_sample
from xpt_mde_tpu.ops.synthesize import synthesize_multi_scale, synthesize_single_scale
from xpt_mde_tpu.ops.flow_warp import flow_warp_multi_scale, flow_bilinear_sample
