"""Model task wrappers: bind a model family to its train/eval steps, init,
and reconstruction logging.

This is the functional replacement for the reference LightningModules'
harness-facing surface (training_step / validation_step / predict_step /
geometric_reconstruction; model.py:498-790, voxel_net.py:275-443).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import GenNerf, GenNerfConfig, VoxelNet, VoxelNetConfig, config_from_dict
from ..models.gen_nerf import SceneRepr
from ..tsdf import TSDF
from ..tsdf.fusion import apply_fusion_prior
from .predict import predict_tsdf_volume
from .state import TrainState, create_train_state, make_optimizer
from .step import (
    make_gen_nerf_eval_step,
    make_gen_nerf_train_step,
    make_voxel_net_eval_step,
    make_voxel_net_train_step,
)


def _array_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Drop non-array (metadata) entries before device transfer."""
    return {k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jnp.ndarray))}


def dtype_for_precision(precision) -> jnp.dtype:
    """Map the trainer.precision surface (reference
    configs/trainer/default.yaml:12 'bf16-mixed', gpu.yaml:7 '16-mixed') to
    the model compute dtype. Mixed = bf16 activations/matmuls with f32
    params, f32 norms, f32 accumulators, f32 losses; '16-mixed' (fp16) maps
    to bf16 — the TPU has no fp16 pipeline and bf16 needs no loss scaling
    (same exponent range as f32)."""
    if precision in (None, 32, "32", "32-true", "32-mixed", "f32", "float32"):
        return jnp.float32
    if precision in (16, "16", "bf16", "bf16-mixed", "bf16-true", "16-mixed",
                     "16-true", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unsupported trainer.precision {precision!r}")


def _maybe_load_pretrained(variables: dict, cfg) -> dict:
    """Graft ported ImageNet backbone weights (scripts/port_weights.py npz)
    into freshly-initialized variables when configured (reference
    spatial_encoder.py:62-69 weights='DEFAULT')."""
    enc = cfg.encoder
    path = enc.use_spatial and enc.spatial.pretrained_path
    if not path:
        return variables
    from ..utils.port_torch import apply_pretrained_npz

    return apply_pretrained_npz(variables, path, scope_path=("spatial", "resnet"))


class GenNerfTask:
    name = "GenNerf"

    def __init__(self, model_cfg_dict: Dict[str, Any], precision=None,
                 gradient_clip_val=None):
        from ..models.teacher import make_teacher

        self.cfg: GenNerfConfig = config_from_dict(GenNerfConfig, model_cfg_dict)
        teacher = make_teacher(self.cfg.teacher)
        if self.cfg.encoder.use_auxiliary and teacher is not None:
            assert self.cfg.encoder.auxiliary_dim == teacher.feature_dim, (
                "encoder.auxiliary_dim must equal teacher.feature_dim"
            )
        self.dtype = dtype_for_precision(precision)
        self.gradient_clip_val = gradient_clip_val
        self.model = GenNerf(self.cfg, teacher=teacher, dtype=self.dtype)
        self.tx = make_optimizer(self.cfg.optimizer, gradient_clip_val)
        self.train_step = make_gen_nerf_train_step(self.model, self.cfg, self.tx)
        self.eval_step = make_gen_nerf_eval_step(self.model, self.cfg)
        self.voxel_sizes = [int(self.cfg.voxel_size * 100)]

    def init_state(self, key: jax.Array, batch: Dict[str, Any]) -> TrainState:
        b = _array_batch(batch)
        B, T = b["image"].shape[:2]
        xyz = jnp.zeros((B, 8, 3), jnp.float32)
        variables = self.model.init(
            key,
            jnp.asarray(b["projection"]), jnp.asarray(b["image"]), jnp.asarray(b["depth"]),
            xyz, jax.random.PRNGKey(0), tuple(self.cfg.voxel_dim_train),
            jnp.zeros(3), train=False,
        )
        variables = _maybe_load_pretrained(variables, self.cfg)
        return create_train_state(variables, self.tx)

    def run_train_step(self, state, batch, key):
        return self.train_step(state, _array_batch(batch), key)

    def run_eval_step(self, state, batch, key):
        return self.eval_step(state, _array_batch(batch), key)

    # -- reconstruction (validation-tail / test visualization) ----------------
    def reconstruct(self, state: TrainState, batch: Dict[str, Any], b_idx: int = 0,
                    voxel_dim=None) -> Tuple[TSDF, TSDF]:
        """Encode sequence b_idx, densely decode the TSDF volume, wrap pred +
        target into TSDF objects (reference geometric_reconstruction,
        model.py:691-716)."""
        b = _array_batch(batch)
        cfg = self.cfg
        origin = jnp.zeros(3, jnp.float32)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # GT-less scenes (ScenesDataset without fused volumes) size the decode
        # volume from config instead (reference voxel_dim_test,
        # voxel_net.py:354-384); trgt is then None
        key = "vol_%02d_tsdf" % self.voxel_sizes[0]
        trgt = np.asarray(b[key])[b_idx, 0] if key in b else None
        voxel_dim = tuple(
            voxel_dim or (trgt.shape if trgt is not None else cfg.voxel_dim_test)
        )

        repr_, _ = self.model.apply(
            variables,
            jnp.asarray(b["projection"][b_idx : b_idx + 1]),
            jnp.asarray(b["image"][b_idx : b_idx + 1]),
            jnp.asarray(b["depth"][b_idx : b_idx + 1]),
            jax.random.PRNGKey(0), voxel_dim, origin,
            train=False, method=GenNerf.encode, mutable=["batch_stats"],
        )
        if cfg.mask_unobserved and cfg.sparse_band_decode:
            # prior-first: decode only the near-surface band; everything
            # else is the prior's deterministic constant (same output as
            # the dense-decode + clamp below, ~10x fewer decoded points)
            from .predict import predict_tsdf_volume_sparse

            vol = predict_tsdf_volume_sparse(
                self.model, variables, repr_, voxel_dim, cfg.voxel_size,
                np.zeros(3),
                jnp.asarray(b["projection"][b_idx]),
                jnp.asarray(b["depth"][b_idx]),
            )
        else:
            vol = predict_tsdf_volume(
                self.model, variables, repr_, voxel_dim, cfg.voxel_size, np.zeros(3)
            )
            if cfg.mask_unobserved:
                # clamp voxels no input frame touches to the fusion init (+1):
                # there the fused GT is +1 deterministically, and the decoder's
                # extrapolation only adds hallucinated surface (see
                # tsdf.fusion.apply_fusion_prior)
                vol = apply_fusion_prior(
                    vol, cfg.voxel_size, jnp.zeros(3),
                    jnp.asarray(b["projection"][b_idx]),
                    jnp.asarray(b["depth"][b_idx]),
                )
        origin_arr = jnp.zeros((1, 3))
        return (
            TSDF(cfg.voxel_size, origin_arr, vol),
            TSDF(cfg.voxel_size, origin_arr, jnp.asarray(trgt)) if trgt is not None else None,
        )


class VoxelNetTask:
    name = "VoxelNet"

    def __init__(self, model_cfg_dict: Dict[str, Any], precision=None,
                 gradient_clip_val=None):
        self.cfg: VoxelNetConfig = config_from_dict(VoxelNetConfig, model_cfg_dict)
        self.dtype = dtype_for_precision(precision)
        self.gradient_clip_val = gradient_clip_val
        self.model = VoxelNet(self.cfg, dtype=self.dtype)
        self.tx = make_optimizer(self.cfg.optimizer, gradient_clip_val)
        self.train_step = make_voxel_net_train_step(self.model, self.cfg, self.tx)
        self.eval_step = make_voxel_net_eval_step(self.model, self.cfg)
        final = int(self.cfg.voxel_size * 100)
        self.voxel_sizes = [
            final * 2**i for i in range(len(self.cfg.backbone3d.layers_down) - 1)
        ]

    def init_state(self, key: jax.Array, batch: Dict[str, Any]) -> TrainState:
        b = _array_batch(batch)
        # always initialize GT-less: the loss branch creates no parameters,
        # and a predict-time batch may carry targets at voxel_dim_test (or a
        # partial scale pyramid) that don't match voxel_dim_train — init
        # must not couple to target shapes
        variables = self.model.init(
            key,
            jnp.asarray(b["projection"]), jnp.asarray(b["image"]), jnp.asarray(b["depth"]),
            tuple(self.cfg.voxel_dim_train), jnp.zeros(3), None, train=False,
        )
        variables = _maybe_load_pretrained(variables, self.cfg)
        return create_train_state(variables, self.tx)

    def run_train_step(self, state, batch, key):
        return self.train_step(state, _array_batch(batch), key)

    def run_eval_step(self, state, batch, key):
        return self.eval_step(state, _array_batch(batch), key)

    def forward_volumes(self, state: TrainState, batch, voxel_dim=None):
        b = _array_batch(batch)
        gt_key = "vol_%02d_tsdf" % self.voxel_sizes[0]
        voxel_dim = tuple(
            voxel_dim
            or (b[gt_key].shape[-3:] if gt_key in b else self.cfg.voxel_dim_test)
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs, _ = self.model.apply(
            variables,
            jnp.asarray(b["projection"]), jnp.asarray(b["image"]), jnp.asarray(b["depth"]),
            voxel_dim, jnp.zeros(3), None, train=False,
        )
        return outputs

    def reconstruct(self, state: TrainState, batch, b_idx: int = 0, voxel_dim=None):
        outputs = self.forward_volumes(state, batch, voxel_dim)
        key = "vol_%02d_tsdf" % self.voxel_sizes[0]
        pred = outputs[key][b_idx, 0]
        b = _array_batch(batch)
        trgt = jnp.asarray(b[key][b_idx, 0]) if key in b else None
        origin_arr = jnp.zeros((1, 3))
        vs = self.cfg.voxel_size
        if self.cfg.mask_unobserved:
            pred = apply_fusion_prior(
                pred, vs, jnp.zeros(3),
                jnp.asarray(b["projection"][b_idx]),
                jnp.asarray(b["depth"][b_idx]),
            )
        return (
            TSDF(vs, origin_arr, pred),
            TSDF(vs, origin_arr, trgt) if trgt is not None else None,
        )


def make_task(model_cfg_dict: Dict[str, Any], precision=None,
              gradient_clip_val=None):
    """Build the model task. `precision` is the trainer.precision string
    (reference trainer/default.yaml:12); bf16-mixed makes the model compute
    in bf16 with f32 params/norms/accumulators/losses. `gradient_clip_val`
    is trainer.gradient_clip_val — Lightning-style global-norm clipping
    chained before the optimizer."""
    t = model_cfg_dict.get("type", "GenNerf")
    if t == "GenNerf":
        return GenNerfTask(model_cfg_dict, precision=precision,
                           gradient_clip_val=gradient_clip_val)
    if t == "VoxelNet":
        return VoxelNetTask(model_cfg_dict, precision=precision,
                            gradient_clip_val=gradient_clip_val)
    raise NotImplementedError(f"model type {t}")
