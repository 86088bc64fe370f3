from sstem_tpu.kernels.sepconv import (
    sepconv,
    sepconv_planar,
    sepconv_reference,
    sepconv_reference_planar,
    set_sepconv_impl,
)

__all__ = [
    "sepconv",
    "sepconv_planar",
    "sepconv_reference",
    "sepconv_reference_planar",
    "set_sepconv_impl",
]
