from sstem_tpu.infer.tiles import infer_full, infer_tiled, tile_image, untile
from sstem_tpu.infer.pipeline import SFFPipeline, SPPipeline

__all__ = [
    "infer_full",
    "infer_tiled",
    "tile_image",
    "untile",
    "SFFPipeline",
    "SPPipeline",
]
