from sstem_tpu.kernels.sepconv import sepconv, sepconv_reference, set_sepconv_impl

__all__ = ["sepconv", "sepconv_reference", "set_sepconv_impl"]
