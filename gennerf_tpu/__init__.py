"""gennerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for generalizable
neural fields for scene-level 3D reconstruction from posed RGB-D observations.

Re-designed from scratch with the capability surface of the reference
research stack (mrchris7/gen-nerf): an encoder `f` that lifts N posed RGB-D
frames into a volumetric feature grid plus a PointNet triplane representation,
and a decoder `g` (positional encoding + ResNet-MLP) that maps world-space
query points to geometric (TSDF) and semantic features.

Architecture is TPU-first:
  * pure-functional models (flax.linen) — one jit'd `(state, batch) -> state`
    training step; the reference's stateful `encode()` accumulator becomes an
    explicit `lax.scan` fold over the frame axis.
  * fixed shapes everywhere — validity-masked sampling instead of
    data-dependent `argwhere`.
  * Pallas kernels for hot gathers/scatters, XLA elsewhere.
  * scaling via `jax.sharding.Mesh` + collectives (no NCCL/DDP objects).
"""

__version__ = "0.1.0"
