from sstem_tpu.ops.pad import negative_pad_2d, replication_pad_2d
from sstem_tpu.ops.resize import (
    upsample2x_planar,
    upsample2x_planar_mxu,
    upsample_bilinear_align_corners,
)
from sstem_tpu.ops.warp import image_warp, spatial_transform
from sstem_tpu.ops.flow import gen_line, gen_flow, gen_flow_np

__all__ = [
    "negative_pad_2d",
    "replication_pad_2d",
    "upsample2x_planar",
    "upsample2x_planar_mxu",
    "upsample_bilinear_align_corners",
    "image_warp",
    "spatial_transform",
    "gen_line",
    "gen_flow",
    "gen_flow_np",
]
