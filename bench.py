#!/usr/bin/env python3
"""Benchmark harness: flagship decode throughput on the current accelerator.

Measures the headline workload (SURVEY §6): dense TSDF query-point decoding
through the flagship GenNerf decoder (triplane bilinear sample + positional
encoding + ResnetFC + TSDF head) at the reference's val voxel grid
(256x256x96 ~ 6.3M points), after encoding a synthetic 8-frame RGB-D scene
at 640x480.

vs_baseline: ratio against the PyTorch reference decoder math executed on
this host's CPU with the reference's own chunking (10k-point chunks,
model.py:769-777). The reference publishes no benchmark numbers
(BASELINE.md), so the baseline is measured, not quoted; the measurement is
cached in BASELINE_MEASURED.json with methodology.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")

# flagship decoder hyperparameters (reference experiment
# seq1_0244_01_frames8_evenspaced_pointnet)
C_DIM = 64
PLANE_RESO = 128
D_HIDDEN = 256
N_BLOCKS = 5
NUM_FREQS = 6
FREQ_FACTOR = 0.5
D_OUT = 65  # d_out_geo=64 + d_out_sem=1
VOXEL_DIM = (256, 256, 96)  # reference voxel_dim_val


def measure_torch_reference_decode(num_chunks: int = 12, chunk: int = 10000) -> float:
    """Reference decoder math in torch (CPU), reference chunking. Returns
    points/sec."""
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(os.cpu_count() or 8)
    d_code = NUM_FREQS * 2 * 3 + 3

    class RefBlock(torch.nn.Module):
        def __init__(self, d):
            super().__init__()
            self.fc_0 = torch.nn.Linear(d, d)
            self.fc_1 = torch.nn.Linear(d, d)

        def forward(self, x):
            return x + self.fc_1(torch.relu(self.fc_0(torch.relu(x))))

    class RefDecoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin_in = torch.nn.Linear(C_DIM, D_HIDDEN)
            self.lin_z = torch.nn.ModuleList(
                [torch.nn.Linear(d_code, D_HIDDEN) for _ in range(N_BLOCKS)]
            )
            self.blocks = torch.nn.ModuleList([RefBlock(D_HIDDEN) for _ in range(N_BLOCKS)])
            self.lin_out = torch.nn.Linear(D_HIDDEN, D_OUT)
            self.head = torch.nn.Linear(64, 1)
            freqs = FREQ_FACTOR * 2.0 ** torch.arange(NUM_FREQS)
            self._freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
            phases = torch.zeros(2 * NUM_FREQS)
            phases[1::2] = np.pi * 0.5
            self._phases = phases.view(1, -1, 1)

        def forward(self, planes, xyz):
            # triplane bilinear sampling (reference sample_plane_feature x3)
            feat = 0
            for i, axes in enumerate([(0, 2), (0, 1), (1, 2)]):
                uv = xyz[..., axes] / 1.1 + 0.5
                vgrid = (2 * uv - 1).view(1, -1, 1, 2)
                feat = feat + F.grid_sample(
                    planes[i], vgrid, padding_mode="border", align_corners=True
                )[0, :, :, 0].T
            # positional encoding
            x = xyz.view(-1, 3)
            embed = x.unsqueeze(1).repeat(1, NUM_FREQS * 2, 1)
            embed = torch.sin(torch.addcmul(self._phases, embed, self._freqs))
            code = torch.cat((x, embed.view(x.shape[0], -1)), dim=-1)
            # ResnetFC with per-block latent injection
            h = self.lin_in(feat)
            for blk, lz in zip(self.blocks, self.lin_z):
                h = blk(h + lz(code))
            out = self.lin_out(torch.relu(h))
            return torch.tanh(self.head(out[..., :64]))

    model = RefDecoder().eval()
    planes = [torch.randn(1, C_DIM, PLANE_RESO, PLANE_RESO) for _ in range(3)]
    pts = torch.rand(num_chunks, chunk, 3) - 0.5
    with torch.no_grad():
        model(planes, pts[0])  # warmup
        t0 = time.perf_counter()
        for i in range(num_chunks):
            model(planes, pts[i])
        dt = time.perf_counter() - t0
    return num_chunks * chunk / dt


def get_baseline() -> dict:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    pps = measure_torch_reference_decode()
    data = {
        "reference_decode_points_per_sec": pps,
        "methodology": (
            "PyTorch reference decoder math (triplane grid_sample x3 + NeRF "
            "positional encoding + 5-block ResnetFC d_hidden=256 with "
            "per-block latent injection + tanh TSDF head, flagship "
            "hyperparameters), torch CPU on this host, reference 10k-point "
            "chunking (model.py:769-777). The reference publishes no "
            "benchmark numbers; its hardware (4x A40) is unavailable here."
        ),
        "hardware": f"cpu x{os.cpu_count()}",
    }
    with open(BASELINE_FILE, "w") as f:
        json.dump(data, f, indent=2)
    return data


def _accelerator_reachable(timeout_s: float = 300.0) -> bool:
    """Bounded subprocess backend probe (shared with
    __graft_entry__.dryrun_multichip — one policy for timeouts/parsing)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gennerf_tpu.parallel.platform import probe_backend

    return probe_backend(timeout_s) is not None


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"))
    if not _accelerator_reachable():
        # degrade to a CPU measurement rather than hanging forever: the
        # printed metric names the platform, so a fallback run is visible
        print("accelerator backend unreachable; falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_cfg
    from gennerf_tpu.data.synthetic import render_scene, look_at_pose
    from gennerf_tpu.models import GenNerf
    from gennerf_tpu.models.gen_nerf import GenNerf as _G
    from gennerf_tpu.train.predict import (
        decode_dense,
        decode_grid_fused,
        dense_grid_points,
    )

    platform = jax.devices()[0].platform
    cfg = _flagship_cfg()
    # decoder in bf16 (params fp32): the inference numerics policy — TSDF
    # values live in [-1,1] and tolerate bf16 activations
    model = GenNerf(cfg, dtype=jnp.bfloat16)

    # synthetic 8-frame scene (reduced resolution: encode is setup here, not
    # the measured quantity — the decode throughput is resolution-independent)
    H, W = 240, 320
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    projs, depths, images = [], [], []
    for i in range(8):
        a = 2 * np.pi * i / 8
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        depth, color = render_scene(H, W, K, pose)
        projs.append((K @ np.linalg.inv(pose)[:3]).astype(np.float32))
        depths.append(depth)
        images.append(color.transpose(2, 0, 1).astype(np.float32))
    proj = jnp.asarray(np.stack(projs))[None]
    depth = jnp.asarray(np.stack(depths))[None]
    image = jnp.asarray(np.stack(images))[None]

    key = jax.random.PRNGKey(0)
    xyz0 = jnp.zeros((1, 8, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(1), proj, image, depth, xyz0, key,
        cfg.voxel_dim_val, jnp.zeros(3), train=False,
    )
    repr_, _ = model.apply(
        variables, proj, image, depth, key, cfg.voxel_dim_val, jnp.zeros(3),
        train=False, method=_G.encode, mutable=["batch_stats"],
    )
    jax.block_until_ready(repr_.planes["xz"])

    n_pts = int(np.prod(VOXEL_DIM))
    chunk_size = 32768  # v5e sweep optimum (BENCH.md)
    origin = jnp.zeros(3, jnp.float32)

    # decode path: the separable fused grid kernel (the production inference
    # path — triplane sampling factored into per-axis resample matmuls +
    # in-kernel broadcast adds, whole ResnetFC in VMEM; 38.7M pts/s vs 22.5M
    # for the chunked XLA program on v5e-1, BENCH.md round-2 log). Falls back
    # to the XLA path off-TPU / for unsupported configs.
    from gennerf_tpu.train.predict import decode_grid_separable_xla

    def _pallas(_):
        return decode_grid_fused(
            model, variables, repr_, VOXEL_DIM, cfg.voxel_size, origin
        )

    def _separable(_):
        return decode_grid_separable_xla(
            model, variables, repr_, VOXEL_DIM, cfg.voxel_size, origin
        )

    _pts_cache = []

    def _gather(_):
        if not _pts_cache:  # built once — not part of the timed decode
            _pts_cache.append(
                dense_grid_points(VOXEL_DIM, cfg.voxel_size, np.zeros(3)))
        return decode_dense(model, variables, repr_, _pts_cache[0], origin,
                            chunk_size)

    # walk the same tier order the production dispatcher
    # (predict_tsdf_volume) walks; the first tier that runs IS the warmup —
    # an eligibility probe would execute a full 6.3M-pt decode only to
    # discard it (minutes on the 1-core CPU fallback path)
    tsdf = None
    for path, decode in (("pallas-grid", _pallas),
                         ("separable-xla", _separable),
                         ("xla-gather", _gather)):
        try:
            tsdf = decode(None)  # compile + warmup
            break
        except NotImplementedError:
            continue
    assert tsdf is not None, "no decode tier eligible"

    # NOTE: on the tunneled TPU platform block_until_ready returns before
    # remote execution completes, so timings force a host fetch of the
    # result (a sum) to guarantee end-to-end completion.
    # Each trial chains REP decodes and fetches ONE accumulated scalar:
    # the tunnel round-trip (tens of ms here — comparable to the decode
    # itself) amortizes over REP, matching the production regime of
    # back-to-back volume decodes. Round-1's single-shot timing
    # under-reported the kernel ~2x for exactly this reason (BENCH.md).
    float(tsdf.sum())  # compiles the .sum() chain used in the timing loop
    # REP amortizes the tunnel round-trip; off-TPU (the CPU fallback when
    # the tunnel is unreachable) there is no RTT to amortize and a single
    # 6.3M-pt decode is ~4.4 TFLOPs on one host core — keep the fallback
    # bounded at a few decodes
    on_tpu = platform == "tpu"
    # contention guard (round-4 lesson: the official r04 bench ran while a
    # training drive held the chip and recorded a 36% regression nobody
    # flagged): snapshot host load going in, and compare the result to the
    # recorded healthy envelope for this (platform, tier).
    load_before = os.getloadavg()[0]
    REP = 10 if on_tpu else 2
    times = []
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(REP):
            acc = acc + decode(None).sum()
        float(acc)
        times.append((time.perf_counter() - t0) / REP)
    pps = n_pts / min(times)

    baseline = get_baseline()
    ref_pps = baseline["reference_decode_points_per_sec"]
    result = {
        "metric": f"dense TSDF decode throughput ({platform}/{path}, flagship GenNerf decoder, {n_pts} pts)",
        "value": round(pps),
        "unit": "points/s",
        "vs_baseline": round(pps / ref_pps, 2),
    }
    # healthy-envelope drift detection: measured clean-chip numbers for the
    # flagship grid (BENCH.md: r03 bench 105.9M, r04 re-measure 103.1M).
    # >20% below is almost certainly another process holding the chip/host,
    # not a code regression — annotate so the artifact carries the caveat.
    ENVELOPE_PPS = {("tpu", "pallas-grid"): 103.1e6}
    envelope = ENVELOPE_PPS.get((platform, path))
    spread = (max(times) / min(times)) if len(times) > 1 else 1.0
    suspect = []
    if envelope and pps < 0.8 * envelope:
        suspect.append(
            f"value is {pps / envelope:.2f}x the recorded clean-chip envelope "
            f"({envelope / 1e6:.1f}M pts/s)")
    if spread > 1.3:
        suspect.append(f"trial spread {spread:.2f}x (steady chip: <1.1x)")
    if load_before > 1.5:
        suspect.append(f"host loadavg {load_before:.1f} at start (1-core host)")
    if suspect:
        result["contention_suspected"] = "; ".join(suspect)
        print("WARNING: possible chip/host contention — " +
              "; ".join(suspect), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
