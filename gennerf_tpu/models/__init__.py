"""Model layer: flax modules for GenNerf, VoxelNet, and their components."""
from .config import (
    GenNerfConfig,
    VoxelNetConfig,
    EncoderConfig,
    SpatialEncoderConfig,
    PointnetConfig,
    MlpConfig,
    CodeConfig,
    LossConfig,
    RayConfig,
    FrustumConfig,
    OptimizerConfig,
    SchedulerConfig,
    Backbone3dConfig,
    HeadsConfig,
    config_from_dict,
)
from .gen_nerf import GenNerf, SceneRepr
from .voxel_net import VoxelNet, VolumeRepr
from .positional_encoding import positional_encoding, positional_encoding_dim
from .resnetfc import ResnetFC, ResnetBlockFC, combine_interleaved
from .pointnet import LocalPoolPointnet, FeaturePlaneMerger
from .spatial_encoder import SpatialEncoder, spatial_latent_size
from .resnet import ResNetStages
from .unet import UNet
from .heads import TSDFHeadSimple, TSDFHead, VoxelHeads
from .backbone3d import EncoderDecoder, BasicBlock3d, ConditionalProjection
from . import losses

__all__ = [k for k in dir() if not k.startswith("_")]
