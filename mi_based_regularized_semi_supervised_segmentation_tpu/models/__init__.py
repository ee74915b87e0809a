from .unet import UNet, UNET_DIMENSIONS, ENCODER_NAMES, DECODER_NAMES, COMPONENT_NAMES
from .zoo import ARCH_CALLABLES, AttentionUNet, ENet, VNet, get_arch, register_arch
from .heads import (
    ClusterHead,
    LocalClusterHead,
    ProjectionHead,
    LocalProjectionHead,
    ProjectorWrapper,
    split_feature_names,
)

__all__ = [
    "UNet",
    "UNET_DIMENSIONS",
    "ENCODER_NAMES",
    "DECODER_NAMES",
    "COMPONENT_NAMES",
    "ClusterHead",
    "LocalClusterHead",
    "ProjectionHead",
    "LocalProjectionHead",
    "ProjectorWrapper",
    "split_feature_names",
    "ARCH_CALLABLES",
    "get_arch",
    "register_arch",
    "ENet",
    "AttentionUNet",
    "VNet",
]
