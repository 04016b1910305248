"""Frozen model-config dataclasses.

Field names mirror the reference Hydra config surface
(configs/model/gen_nerf.yaml, configs/model/voxel_net.yaml) so experiment
YAMLs translate 1:1. All are hashable (frozen, tuples) so they can be flax
Module attributes / jit static args.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SpatialEncoderConfig:
    backbone: str = "resnet34"
    pretrained: bool = True
    # path to a ported-weights npz (scripts/port_weights.py output); when
    # set, task init grafts the ImageNet backbone into the init tree
    # (reference torchvision weights="DEFAULT", spatial_encoder.py:62-69)
    pretrained_path: Optional[str] = None
    num_layers: int = 4
    index_interp: str = "bilinear"
    index_padding: str = "border"
    upsample_interp: str = "bilinear"
    feature_scale: float = 2.0
    use_first_pool: bool = True
    norm_type: str = "batch"
    blur_image: bool = True
    kernel_size: int = 41
    sigma: float = 10.0
    # 1x1 channel-reduce conv after the stage concat (the reference's
    # latent-size reduction, spatial_encoder.py:74-77): shrinks both the
    # backprojected volume's channel count and the decoder's d_in. At
    # reference resolution (T=8 x 640x480) the full 512-ch resnet34 concat
    # does not fit a 16 GB chip through backward; out_channels + frame_chunk
    # are the two levers that make it fit (BENCH.md batch-scaling section).
    out_channels: Optional[int] = None
    # encode frames in chunks of this many (0 = all B*T frames in one conv
    # pass): only one chunk's ResNet activation pyramid is live at a time,
    # with the f32 volume accumulator carrying state between chunks — the
    # scan-over-T formulation of the reference's per-frame python encode
    # loop (model.py:100). Combine with model.remat for backward.
    frame_chunk: int = 0


@dataclasses.dataclass(frozen=True)
class PointnetConfig:
    num_sparse_points: int = 512
    # uniformly pre-subsample each frame's unprojected cloud to this many
    # points before farthest-point sampling (0 = off). FPS cost is linear in
    # cloud size and dominates encode (~99% at 480p); a uniform presample of
    # a dense depth cloud leaves the FPS result distribution essentially
    # unchanged. Perf-motivated delta vs the reference (which runs FPS on
    # the full 307k-point cloud).
    fps_presample: int = 16384
    # 'fps' (reference parity) | 'voxel_hash' (fully parallel, no
    # sequential loop — ops/sampling.voxel_hash_downsample; a documented
    # distribution delta that removes FPS's npoint sequential iterations)
    sparsifier: str = "fps"
    # Map world coordinates into ConvONet's expected ~[-0.5, 0.5] cube
    # (centered on the training volume) before the pointnet scatter and the
    # triplane sampling. The reference feeds RAW world coords (meters) into
    # normalize_coordinate (model.py:131-161), which clamps ~93% of a
    # real-scale scene onto the plane border and collapses the triplane
    # signal — measurably, the training loss becomes encoder-independent
    # after one step. Off by default for strict reference parity.
    normalize_coords: bool = False
    c_dim: int = 32
    dim: int = 3
    padding: float = 0.1
    hidden_dim: int = 32
    scatter_type: str = "max"
    plane_type: Tuple[str, ...] = ("xz", "xy", "yz")
    plane_resolution: int = 128
    grid_resolution: int = 32
    n_blocks: int = 5
    unet: bool = True
    unet3d: bool = False
    unet3d_f_maps: int = 32
    unet3d_num_levels: int = 3
    unet_depth: int = 5
    unet_merge_mode: str = "concat"
    unet_start_filts: int = 32
    sample_mode: str = "bilinear"


@dataclasses.dataclass(frozen=True)
class PlaneMergerConfig:
    strategy: str = "average"
    alpha: float = 0.1


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    use_spatial: bool = True
    spatial: SpatialEncoderConfig = SpatialEncoderConfig()
    use_pointnet: bool = True
    pointnet: PointnetConfig = PointnetConfig()
    plane_merger: PlaneMergerConfig = PlaneMergerConfig()
    use_auxiliary: bool = False
    auxiliary_dim: int = 0  # teacher 2D feature channels when use_auxiliary


@dataclasses.dataclass(frozen=True)
class MlpConfig:
    d_out_sem: int = 32
    d_out_geo: int = 32
    n_blocks: int = 5
    d_hidden: int = 512
    combine_layer: int = 1000
    combine_type: str = "average"
    beta: float = 0.0
    use_spade: bool = False
    use_layer_norm: bool = False
    alpha: float = 1.0
    # TSDF head output scale (the reference TSDFHead's label_smoothing=1.05
    # trick, heads3d.py:95, applied to the point head): with scale s > 1 a
    # +-1 target is met at tanh = +-1/s, so tanh never saturates and the
    # near-surface ramp keeps gradient throughout training — the fix for
    # half-budget runs meshing EMPTY (field stuck at exactly +-1, which
    # mesh extraction treats as unknown/outside). 1.0 = reference-exact
    # point-head math (the trained-parity oracles pin that default).
    head_smoothing: float = 1.0


@dataclasses.dataclass(frozen=True)
class CodeConfig:
    num_freqs: int = 2
    freq_factor: float = 0.5
    include_input: bool = True


@dataclasses.dataclass(frozen=True)
class RayConfig:
    num_rays: int = 100
    N: int = 20
    M: int = 8
    d_min: float = 0.07
    delta: float = 0.1
    sigma: float = 0.1


@dataclasses.dataclass(frozen=True)
class FrustumConfig:
    N_free: int = 384
    N_near: int = 128
    N_surf: int = 128
    sigma: float = 0.1
    d_min: float = 0.5
    d_max: float = 4.0


@dataclasses.dataclass(frozen=True)
class TsdfLossConfig:
    weight: float = 1.0
    transform: str = "smooth_log"  # 'log' | 'smooth_log' | 'none'
    shift: float = 20.0
    smoothness: float = 8.0


@dataclasses.dataclass(frozen=True)
class IsdfLossConfig:
    weight: float = 1.0
    free_space_factor: float = 5.0
    trunc_weight: float = 5.0


@dataclasses.dataclass(frozen=True)
class EikonalLossConfig:
    weight: float = 0.25
    apply_distance: float = 0.1


@dataclasses.dataclass(frozen=True)
class GradientLossConfig:
    weight: float = 0.02


@dataclasses.dataclass(frozen=True)
class FeatureLossConfig:
    weight: float = 0.1


@dataclasses.dataclass(frozen=True)
class DistillLossConfig:
    """Semantic distillation of e_sem toward 2D teacher features (the
    reference's intended-but-stubbed VLM path, model.py:32).

    mode='surface' supervises e_sem at the depth-backprojected surface
    samples the TSDF loss already visits. mode='render' is the reference's
    aspirational design (its UNISURF renderer prototype, renderer.py:39-213,
    was built for exactly this and never wired): rays are marched through
    the CURRENT decoded TSDF field inside the train step, e_sem is decoded
    at the marched surface crossings (geometry stop-gradient, UNISURF-style
    appearance-at-fixed-geometry), and supervised by the teacher at the
    corresponding pixels — masked to rays that hit a crossing AND have
    valid GT depth. Render mode assumes the geometry is anchored by an
    active TSDF/iSDF term: with nothing holding the field, the shared
    trunk can reduce the masked loss by erasing its own ray crossings
    (hit-mask attrition), since the mask is non-differentiable by
    design."""

    weight: float = 1.0
    metric: str = "cosine"  # 'cosine' | 'l2'
    mode: str = "surface"  # 'surface' | 'render'
    # Render-mode warm start: when the march finds no zero crossing along a
    # ray (the early field is tanh-saturated and crossing-free), fall back
    # to supervising e_sem at the GT-depth backprojected surface point of
    # that ray instead of dropping it from the mask. Without this the
    # `ok & hit` mask goes empty once the early field saturates and the
    # distill term silently trains on NOTHING (observed: a 60-epoch drive
    # logged train_distill = exactly 0.0 for epochs 1-59). The fallback is
    # the reference's depth-backprojected 'surface' idea applied per-ray;
    # as crossings form, supervision hands over to the marched points.
    gt_warmstart: bool = True
    # render-mode march budget (per frame; renderer-default hierarchy)
    render_rays: int = 32
    render_steps: int = 16
    render_fine: int = 8
    render_secant: int = 4
    render_near: float = 0.05
    render_far: float = 5.0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    use_tsdf: bool = True
    tsdf: TsdfLossConfig = TsdfLossConfig()
    use_isdf: bool = False
    isdf: IsdfLossConfig = IsdfLossConfig()
    use_eikonal: bool = False
    eikonal: EikonalLossConfig = EikonalLossConfig()
    use_gradient: bool = False
    gradient: GradientLossConfig = GradientLossConfig()
    use_feature: bool = False
    feature: FeatureLossConfig = FeatureLossConfig()
    use_distill: bool = False
    distill: DistillLossConfig = DistillLossConfig()


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    type: str = "Adam"
    lr: float = 0.001
    weight_decay: float = 0.0


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    type: str = "StepLR"
    step_size: int = 300
    gamma: float = 0.1


@dataclasses.dataclass(frozen=True)
class TeacherConfig:
    type: str = "none"  # 'none' | 'random_projection'
    feature_dim: int = 64
    patch: int = 8
    stride: int = 4
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class GenNerfConfig:
    type: str = "GenNerf"
    voxel_size: float = 0.04
    voxel_dim_train: Tuple[int, int, int] = (160, 160, 64)
    voxel_dim_val: Tuple[int, int, int] = (256, 256, 96)
    voxel_dim_test: Tuple[int, int, int] = (416, 416, 128)
    # inference: clamp decoded voxels no input frame touches to the fusion
    # init (+1) — where the fused GT is +1 deterministically (see
    # tsdf.fusion.apply_fusion_prior); trims hallucinated surface outside
    # observed space
    mask_unobserved: bool = True
    # prior-first sparse inference: compute the fusion prior BEFORE
    # decoding and decode only the near-surface band (~10% of typical
    # grids) through the arbitrary-point tier; the rest is the prior's
    # deterministic constants. Same output as dense-decode + prior (see
    # train.predict.predict_tsdf_volume_sparse). Requires mask_unobserved.
    sparse_band_decode: bool = False
    # rematerialization: recompute the per-frame backprojection fold in the
    # backward pass instead of storing per-frame residuals (trades FLOPs
    # for HBM at long T / big volumes)
    remat: bool = False
    sampling_mode: str = "ray"  # 'ray' | 'frustum'
    ray: RayConfig = RayConfig()
    frustum: FrustumConfig = FrustumConfig()
    encoder: EncoderConfig = EncoderConfig()
    mlp: MlpConfig = MlpConfig()
    use_code: bool = True
    code: CodeConfig = CodeConfig()
    loss: LossConfig = LossConfig()
    teacher: TeacherConfig = TeacherConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    scheduler: SchedulerConfig = SchedulerConfig()

    @property
    def encoder_latent(self) -> int:
        from .spatial_encoder import spatial_latent_size

        d = 0
        if self.encoder.use_spatial:
            s = self.encoder.spatial
            d += s.out_channels or spatial_latent_size(s.backbone, s.num_layers)
        if self.encoder.use_pointnet:
            d += self.encoder.pointnet.c_dim
        if self.encoder.use_auxiliary:
            d += self.encoder.auxiliary_dim
        return d


@dataclasses.dataclass(frozen=True)
class Backbone3dConfig:
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    layers_down: Tuple[int, ...] = (1, 2, 3, 4)
    layers: Tuple[int, ...] = (3, 2, 1)
    norm: str = "BN"
    drop: float = 0.0
    conditional_skip: bool = False


@dataclasses.dataclass(frozen=True)
class HeadsConfig:
    use_tsdf: bool = True
    tsdf_multi_scale: bool = True
    tsdf_loss_weight: float = 1.0
    tsdf_label_smoothing: float = 1.05
    tsdf_loss_split: str = "pred"
    tsdf_loss_log_transform: bool = True
    tsdf_loss_log_transform_shift: float = 1.0
    tsdf_sparse_threshold: Tuple[float, ...] = (0.99, 0.99, 0.99)


@dataclasses.dataclass(frozen=True)
class VoxelNetConfig:
    type: str = "VoxelNet"
    voxel_size: float = 0.04
    voxel_dim_train: Tuple[int, int, int] = (160, 160, 64)
    voxel_dim_val: Tuple[int, int, int] = (256, 256, 96)
    voxel_dim_test: Tuple[int, int, int] = (416, 416, 128)
    # see GenNerfConfig.mask_unobserved
    mask_unobserved: bool = True
    # rematerialize the encode fold AND the 3D backbone residual blocks in
    # backward (trades FLOPs for HBM at reference-scale volumes)
    remat: bool = False
    encoder: EncoderConfig = EncoderConfig(
        use_pointnet=False,
        spatial=SpatialEncoderConfig(blur_image=False),
    )
    backbone3d: Backbone3dConfig = Backbone3dConfig()
    heads: HeadsConfig = HeadsConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    scheduler: SchedulerConfig = SchedulerConfig()


def config_from_dict(cls, d: dict):
    """Recursively build a frozen config dataclass from a (nested) dict,
    ignoring unknown keys that the reference configs carry for bookkeeping
    (output_dir, teacher, compile, ...) and flattening `unet_kwargs`-style
    sub-dicts onto prefixed fields."""
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in dict(d).items():
        # reference spells UNet params as a nested unet_kwargs dict
        if key == "unet_kwargs" and isinstance(value, dict):
            for k2, v2 in value.items():
                name = f"unet_{k2}" if f"unet_{k2}" in fields else k2
                if name in fields:
                    kwargs[name] = _deep_tuple(v2) if isinstance(v2, list) else v2
            continue
        if key not in fields:
            # flatten nested dicts onto prefixed flat fields
            # (e.g. heads.tsdf.multi_scale -> tsdf_multi_scale)
            if isinstance(value, dict):
                for k2, v2 in value.items():
                    name = f"{key}_{k2}"
                    if name in fields:
                        kwargs[name] = _deep_tuple(v2) if isinstance(v2, list) else v2
            continue
        f = fields[key]
        default = f.default if f.default is not dataclasses.MISSING else None
        if dataclasses.is_dataclass(default) and isinstance(value, dict):
            kwargs[key] = config_from_dict(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = _deep_tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _deep_tuple(x):
    if isinstance(x, list):
        return tuple(_deep_tuple(v) for v in x)
    return x
