from .simple_fcs import SimpleFCsV1, SimpleFCsV1d, SimpleFCsV2, SimpleFCsV2d
from .abmil import ABMIL, ABMILv2
from .transmil import TransMIL, TransLayer, PPEG, NystromSelfAttention
from .twoway import (TwoWayTransformer, TwoWayTransformer2,
                     TwoWayAttentionBlock, TwoWayAttentionBlock2,
                     Attention, MLPBlock)
from .transmil_per_modality import TransMILPerModality
from .baselines import AggregatorClip, AggregatorConcat, AggregatorWMask
from .ct_resnext import ResNeXt3D, finetune_param_labels
from .resnet2d import Resnet18_2D
from .clip_text import CLIPTextEncoder, CoOpClinicalEncoder, CLIPTextConfig
from .clip_vision import (CLIPVisionConfig, CLIPVisionTransformer,
                          ModifiedResNet, CLIPModel, infer_clip_arch,
                          convert_torch_clip_vision_state_dict)
from .ct_mc3 import ResnetMC3_18, VideoResNetFeatures
from .ct_r2plus1d import Resnet2plus1D_18
from .ct_swin import SwinUNETRMIL
from .ct_mvit import MViTChunked, MViTv2Encoder
from .aggregator import Aggregator, build_model

__all__ = [
    "SimpleFCsV1", "SimpleFCsV1d", "SimpleFCsV2", "SimpleFCsV2d",
    "ABMIL", "ABMILv2", "TransMIL", "TransLayer", "PPEG",
    "NystromSelfAttention", "TwoWayTransformer", "TwoWayAttentionBlock",
    "Attention", "MLPBlock", "CLIPTextEncoder", "CoOpClinicalEncoder",
    "CLIPTextConfig", "CLIPVisionConfig", "CLIPVisionTransformer",
    "ModifiedResNet", "CLIPModel", "infer_clip_arch",
    "convert_torch_clip_vision_state_dict",
    "ResnetMC3_18", "VideoResNetFeatures",
    "Resnet2plus1D_18", "SwinUNETRMIL", "MViTChunked", "MViTv2Encoder",
    "Aggregator", "build_model", "TwoWayTransformer2",
    "TwoWayAttentionBlock2", "TransMILPerModality", "AggregatorClip",
    "AggregatorConcat", "AggregatorWMask", "ResNeXt3D",
    "finetune_param_labels",
    "Resnet18_2D",
]
