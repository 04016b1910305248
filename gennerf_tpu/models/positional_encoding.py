"""NeRF sin/cos positional encoding.

Reference: src/models/components/positional_encoding.py:4-48 — a single
fused sin(x * f + phase) with interleaved phases so (sin, cos) pairs come
out in the reference's exact channel order:
  [x (optional), sin(f0 x0), cos(f0 x0), ..., sin(f0 x_{d-1}), cos(f0 x_{d-1}),
   sin(f1 x0), ...]
(the frequency index is the outer axis, the input dim the inner one, and
sin/cos interleave innermost via the repeated-frequency trick).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding_dim(num_freqs: int, d_in: int, include_input: bool) -> int:
    return num_freqs * 2 * d_in + (d_in if include_input else 0)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int = 6,
    freq_factor: float = float(np.pi),
    include_input: bool = True,
) -> jnp.ndarray:
    """Apply NeRF positional encoding.

    Args:
        x: (..., d_in).

    Returns:
        (..., d_out) with d_out = num_freqs*2*d_in (+ d_in if include_input).
    """
    freqs = freq_factor * 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (F,)
    # interleave each frequency twice with phases (0, pi/2): sin, cos
    rep_freqs = jnp.repeat(freqs, 2).reshape(1, -1, 1)  # (1, 2F, 1)
    phases = jnp.zeros((2 * num_freqs,), dtype=x.dtype).at[1::2].set(np.pi * 0.5)
    phases = phases.reshape(1, -1, 1)

    lead = x.shape[:-1]
    flat = x.reshape(-1, 1, x.shape[-1])  # (N, 1, d_in)
    embed = jnp.sin(flat * rep_freqs + phases)  # (N, 2F, d_in)
    embed = embed.reshape(*lead, -1)
    if include_input:
        embed = jnp.concatenate([x, embed], axis=-1)
    return embed
