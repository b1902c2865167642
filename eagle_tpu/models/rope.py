"""Rotary position embeddings.

Functional equivalents of the reference's four rope variants
(/root/reference/eagle/model/modeling_llama_kv.py:294-446 and
eagle/model/cnets.py:146-188): default, linear scaling, dynamic NTK, and
LLaMA-3.1 frequency warping. All tables are computed in float32 and applied
with the rotate-half layout (first half / second half split), matching HF.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import RopeConfig


def rope_inv_freq(cfg: RopeConfig, head_dim: int, seq_len: int | None = None) -> np.ndarray:
    """Inverse frequencies [head_dim//2], float32 (host-side, static)."""
    base = cfg.theta
    if cfg.scaling_type == "dynamic" and seq_len is not None and seq_len > cfg.original_max_position:
        # dynamic NTK rescaling (cnets.py:170-188)
        base = cfg.theta * (
            (cfg.scaling_factor * seq_len / cfg.original_max_position) - (cfg.scaling_factor - 1)
        ) ** (head_dim / (head_dim - 2))
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    if cfg.scaling_type == "llama3":
        # LLaMA-3.1 warping (modeling_llama_kv.py:208-292)
        low_wl = cfg.original_max_position / cfg.low_freq_factor
        high_wl = cfg.original_max_position / cfg.high_freq_factor
        wavelen = 2.0 * np.pi / inv_freq
        scaled = inv_freq / cfg.scaling_factor
        smooth = (cfg.original_max_position / wavelen - cfg.low_freq_factor) / (
            cfg.high_freq_factor - cfg.low_freq_factor
        )
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = np.where(wavelen > low_wl, scaled, np.where(wavelen < high_wl, inv_freq, mid))
    return inv_freq.astype(np.float32)


def rope_tables(cfg: RopeConfig, head_dim: int, positions: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions [...]; returns ([..., head_dim],)*2 fp32."""
    inv_freq = jnp.asarray(rope_inv_freq(cfg, head_dim))
    pos = positions.astype(jnp.float32)
    if cfg.scaling_type == "linear":
        pos = pos / cfg.scaling_factor
    freqs = pos[..., None] * inv_freq  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding.

    x: [..., T, n_heads, head_dim]; cos/sin: [..., T, head_dim] (broadcast over
    the heads axis). Computed in fp32, cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)
