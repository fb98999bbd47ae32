from .simple_fcs import SimpleFCsV1, SimpleFCsV1d, SimpleFCsV2, SimpleFCsV2d
from .abmil import ABMIL, ABMILv2
from .transmil import TransMIL, TransLayer, PPEG, NystromSelfAttention
from .twoway import TwoWayTransformer, TwoWayAttentionBlock, Attention, MLPBlock
from .clip_text import CLIPTextEncoder, CoOpClinicalEncoder, CLIPTextConfig
from .ct_mc3 import ResnetMC3_18, VideoResNetFeatures
from .ct_r2plus1d import Resnet2plus1D_18
from .ct_swin import SwinUNETRMIL
from .ct_mvit import MViTChunked
from .aggregator import Aggregator, build_model

__all__ = [
    "SimpleFCsV1", "SimpleFCsV1d", "SimpleFCsV2", "SimpleFCsV2d",
    "ABMIL", "ABMILv2", "TransMIL", "TransLayer", "PPEG",
    "NystromSelfAttention", "TwoWayTransformer", "TwoWayAttentionBlock",
    "Attention", "MLPBlock", "CLIPTextEncoder", "CoOpClinicalEncoder",
    "CLIPTextConfig", "ResnetMC3_18", "VideoResNetFeatures",
    "Resnet2plus1D_18", "SwinUNETRMIL", "MViTChunked",
    "Aggregator", "build_model",
]
