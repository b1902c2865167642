"""Pallas TPU kernels for the speculative-decoding hot paths.

The reference leaves these to eager PyTorch/cuBLAS (SURVEY.md §2.5): tree
verification is a dense mask add + sdpa over the whole preallocated cache
(/root/reference/eagle/model/modeling_llama_kv.py:722-743,1036-1041). Here
the tree-verify attention is a flash-style Pallas kernel that never
materializes [T, S] scores or the [T, S] boolean mask in HBM: the mask is
*metadata* — a committed-prefix length plus the small [T, T] tree ancestor
mask held in VMEM — applied on the fly per KV block with online softmax.

Every kernel has an XLA reference implementation (`*_xla`) and equivalence
tests (tests/test_pallas_attn.py); the engine falls back to XLA off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _tree_attn_kernel(start_ref, q_ref, k_ref, v_ref, tm_ref, o_ref,
                      m_scr, l_scr, acc_scr, *, blk: int, T: int, g: int,
                      scale: float):
    """Grid: (n_kv, S // blk); KV-block axis is innermost (sequential on a
    TPU core) so the online-softmax scratch carries across j.

    q_ref: [1, g*T, d] — this kv-head's grouped queries
    k_ref/v_ref: [1, blk, d] — current KV block
    tm_ref: [T, T + 2*blk] bool — tree ancestor mask padded with False on
        both sides (real mask at column offset `blk`)
    o_ref: [1, g*T, d]
    """
    j = pl.program_id(1)
    start = start_ref[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                   # [gT, d]
    k = k_ref[0]                                   # [blk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [gT, blk]

    col = j * blk + jax.lax.broadcasted_iota(jnp.int32, (g * T, blk), 1)
    prefix_ok = col < start
    # tree-mask slice for this block: columns [j*blk - start, ...) of the
    # [T, T] mask; the ±blk padding makes the clamped offset correct for
    # blocks entirely before/after the tree window (slice reads False).
    off = jnp.clip(j * blk - start + blk, 0, T + blk)
    tm = tm_ref[:, pl.ds(off, blk)]                # [T, blk]
    tree_ok = jnp.repeat(tm, g, axis=0)            # [gT, blk] (t-major (T,g))
    s = jnp.where(prefix_ok | tree_ok, s, NEG_INF)

    m_prev = m_scr[:]                              # [gT, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                         # [gT, blk]
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def tree_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                   tree_mask: jnp.ndarray, start: jnp.ndarray,
                   blk: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Fused tree-verify attention for one sequence.

    q: [T, nq, d]; k_cache/v_cache: [n_kv, S, d]; tree_mask: [T, T] bool
    (ancestor-or-self); start: scalar int32 — the tree occupies KV rows
    [start, start+T), committed prefix is [0, start).
    Returns [T, nq*d] in q.dtype. S must be a multiple of blk.
    """
    T0, nq, d = q.shape
    n_kv, S, _ = k_cache.shape
    g = nq // n_kv
    blk = min(blk, S)
    assert S % blk == 0, (S, blk)
    scale = d ** -0.5
    # pad T to a multiple of 8 for clean VMEM tiling; padded rows are fully
    # masked (all-False tree rows) and sliced off at the end
    T = -(-T0 // 8) * 8
    q = jnp.pad(q, ((0, T - T0), (0, 0), (0, 0)))
    tree_mask = jnp.pad(tree_mask, ((0, T - T0), (0, T - T0)))

    # [T, nq, d] → [n_kv, T*g, d] with t-major (T, g) rows per kv head
    qh = q.reshape(T, n_kv, g, d).transpose(1, 0, 2, 3).reshape(n_kv, T * g, d)
    tm_pad = jnp.zeros((T, T + 2 * blk), bool)
    tm_pad = jax.lax.dynamic_update_slice(tm_pad, tree_mask, (0, blk))

    grid = (n_kv, S // blk)
    out = pl.pallas_call(
        functools.partial(_tree_attn_kernel, blk=blk, T=T, g=g, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, g * T, d), lambda h, j, *_: (h, 0, 0)),
                pl.BlockSpec((1, blk, d), lambda h, j, *_: (h, j, 0)),
                pl.BlockSpec((1, blk, d), lambda h, j, *_: (h, j, 0)),
                pl.BlockSpec((T, T + 2 * blk), lambda h, j, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, g * T, d), lambda h, j, *_: (h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((g * T, 1), jnp.float32),
                pltpu.VMEM((g * T, 1), jnp.float32),
                pltpu.VMEM((g * T, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_kv, g * T, d), q.dtype),
        interpret=interpret,
    )(start.reshape(1).astype(jnp.int32), qh, k_cache, v_cache, tm_pad)

    # [n_kv, T*g, d] → [T, nq*d]
    out = out.reshape(n_kv, T, g, d).transpose(1, 0, 2, 3).reshape(T, nq * d)
    return out[:T0]


def tree_attention_xla(q, k_cache, v_cache, tree_mask, start):
    """Reference implementation (same math as models.transformer.attention)."""
    T, nq, d = q.shape
    n_kv, S, _ = k_cache.shape
    g = nq // n_kv
    col = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    prefix = col < start
    placed = jax.lax.dynamic_update_slice(
        jnp.zeros((T, S), bool), tree_mask, (0, start))
    mask = prefix | placed
    qh = q.reshape(T, n_kv, g, d).transpose(1, 2, 0, 3)  # [n_kv, g, T, d]
    s = jnp.einsum("hgtd,hsd->hgts", qh, k_cache,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("hgts,hsd->hgtd", p, v_cache,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.transpose(2, 0, 1, 3).reshape(T, nq * d)
