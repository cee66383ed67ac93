from .convnext import CONVNEXT_CFGS, ConvNeXt, ConvNeXtBlock, ConvNeXtIsotropic
from .factory import IMAGENET_MEAN, IMAGENET_STD, ModelMeta, get_model, list_models
from .layers import (
    Conv,
    DropPath,
    Identity,
    ImageNormalizer,
    LayerNorm,
    NormalizedModel,
    blur_pool_2d,
)
from .pos_embed import interpolate_pos_encoding, resize_vit_pos_embed
from .resnet import RESNET_CFGS, ResNet
from .stems import ConvStem, ConvStem1, ConvStem2, ConvStem3, PatchEmbed, PatchifyStem
from .vit import VIT_CFGS, VisionTransformer

__all__ = [
    "CONVNEXT_CFGS",
    "ConvNeXt",
    "ConvNeXtBlock",
    "ConvNeXtIsotropic",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "ModelMeta",
    "get_model",
    "list_models",
    "Conv",
    "DropPath",
    "Identity",
    "ImageNormalizer",
    "LayerNorm",
    "NormalizedModel",
    "blur_pool_2d",
    "interpolate_pos_encoding",
    "resize_vit_pos_embed",
    "RESNET_CFGS",
    "ResNet",
    "ConvStem",
    "ConvStem1",
    "ConvStem2",
    "ConvStem3",
    "PatchEmbed",
    "PatchifyStem",
    "VIT_CFGS",
    "VisionTransformer",
]
