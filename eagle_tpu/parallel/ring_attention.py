"""Ring attention — sequence-parallel causal prefill over a mesh axis.

The reference has no sequence/context parallelism at all (SURVEY.md §2.4);
its max prefill is whatever one GPU holds. Long-prompt prefill on TPU
shards the sequence across the mesh: each device keeps its own Q rows
resident and K/V blocks rotate around the ring via `ppermute` (one ICI hop
per step), with flash-style online-softmax accumulation — compute on the
current block overlaps the next block's transfer under XLA's scheduler.
This is the standard scaling-book recipe (ring/flash prefill); decode-time
tree verification never needs it (trees are ≤64 tokens).

Correctness is tested against single-device dense attention on the virtual
8-device CPU mesh (tests/test_ring_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attn_local(q, k, v, axis_name: str):
    """shard_map body: q/k/v are the local shards [B, Tl, h, d] (q heads
    already grouped to kv heads outside). Causal over GLOBAL positions."""
    B, Tl, nq, d = q.shape
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    scale = d ** -0.5

    q_pos = me * Tl + jnp.arange(Tl)                     # [Tl] global rows

    def step(carry, s):
        k_blk, v_blk, m, l, acc = carry
        src = (me - s) % n                               # block's home device
        k_pos = src * Tl + jnp.arange(Tl)
        mask = q_pos[:, None] >= k_pos[None, :]          # [Tl, Tl] causal
        sc = jnp.einsum("bthd,bshd->bhts", q, k_blk,
                        preferred_element_type=jnp.float32) * scale
        sc = jnp.where(mask[None, None], sc, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(sc - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhts,bshd->bhtd", p, v_blk.astype(jnp.float32))
        k_nxt = jax.lax.ppermute(k_blk, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
        v_nxt = jax.lax.ppermute(v_blk, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
        return (k_nxt, v_nxt, m_new, l_new, acc_new), None

    m0 = jnp.full((B, nq, Tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, nq, Tl, 1), jnp.float32)
    acc0 = jnp.zeros((B, nq, Tl, d), jnp.float32)
    (k_f, v_f, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-30)                    # [B, h, Tl, d]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)       # [B, Tl, h, d]


def ring_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """Causal self-attention with the sequence sharded over `axis`.

    q: [B, T, nq, d]; k/v: [B, T, n_kv, d] (GQA repeated by the caller or
    n_kv == nq). T must divide by the axis size. Returns [B, T, nq, d].
    """
    B, T, nq, d = q.shape
    n = mesh.shape[axis]
    assert T % n == 0, (T, n)
    if k.shape[2] != nq:  # repeat GQA kv heads
        rep = nq // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(_ring_attn_local, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def prefill_sp(params: dict, cfg, tokens: jnp.ndarray, mesh: Mesh,
               axis: str = "data"):
    """Sequence-parallel prompt prefill: activations sharded [B, T@axis, H],
    attention via the ring — the long-context prefill path the reference
    lacks entirely (its max prompt is single-GPU memory).

    Returns (hidden [B,T,H] post-final-norm, taps [B,T,3H], k [L,B,n_kv,T,d],
    v [L,B,n_kv,T,d]) — the K/V are written into the decode cache by the
    caller. Dense-MLP models only (MoE prefill uses the standard path).
    """
    from ..models.rope import apply_rope, rope_tables
    from ..models.transformer import _dense, rms_norm

    B, T = tokens.shape
    h = jnp.take(params["embed"]["w"], tokens, axis=0).astype(cfg.dtype)
    h = jax.lax.with_sharding_constraint(
        h, NamedSharding(mesh, P(None, axis, None)))
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    cos, sin = rope_tables(cfg.rope, cfg.head_dim, pos)
    tap_layers = jnp.asarray(cfg.tap_layers, jnp.int32)
    taps0 = jnp.zeros((3, B, T, cfg.hidden_size), cfg.dtype)

    def layer(carry, xs):
        h, taps, idx = carry
        lp = xs
        taps = jnp.where((tap_layers == idx)[:, None, None, None], h[None],
                         taps)
        x = rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = _dense(x, lp["wq"], lp.get("bq")).reshape(
            B, T, cfg.num_q_heads, cfg.head_dim)
        k = _dense(x, lp["wk"], lp.get("bk")).reshape(
            B, T, cfg.num_kv_heads, cfg.head_dim)
        v = _dense(x, lp["wv"], lp.get("bv")).reshape(
            B, T, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = ring_self_attention(q, k, v, mesh, axis=axis)
        attn = attn.reshape(B, T, cfg.q_dim)
        h = h + _dense(attn, lp["wo"])
        x2 = rms_norm(h, lp["ln2"], cfg.rms_eps)
        mlp = _dense(jax.nn.silu(_dense(x2, lp["w_gate"]))
                     * _dense(x2, lp["w_up"]), lp["w_down"])
        h = h + mlp
        return (h, taps, idx + 1), (jnp.swapaxes(k, 1, 2),
                                    jnp.swapaxes(v, 1, 2))

    (h, taps, _), (ks, vs) = jax.lax.scan(
        layer, (h, taps0, jnp.int32(0)), params["layers"])
    hidden = rms_norm(h, params["final_norm"], cfg.rms_eps)
    taps = jnp.concatenate([taps[0], taps[1], taps[2]], axis=-1)
    return hidden, taps, ks, vs
