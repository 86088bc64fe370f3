from sstem_tpu.ops.pad import replication_pad_2d
from sstem_tpu.ops.resize import upsample_bilinear_align_corners
from sstem_tpu.ops.warp import image_warp, spatial_transform
from sstem_tpu.ops.flow import gen_line, gen_flow, gen_flow_np

__all__ = [
    "replication_pad_2d",
    "upsample_bilinear_align_corners",
    "image_warp",
    "spatial_transform",
    "gen_line",
    "gen_flow",
    "gen_flow_np",
]
