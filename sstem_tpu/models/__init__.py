from sstem_tpu.models.ifnet import IFNet
from sstem_tpu.models.fusionnet import FusionNet
from sstem_tpu.models.unet_sff import UNetSFF
from sstem_tpu.models.unet_sp import UNetSP, FusionNetSP

__all__ = ["IFNet", "FusionNet", "UNetSFF", "UNetSP", "FusionNetSP"]
