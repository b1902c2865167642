"""Generic target-model transformer (Llama / Qwen2 / Qwen3 / Mixtral).

One functional module replaces the reference's four forked modeling files
(/root/reference/eagle/model/modeling_{llama,qwen2,qwen3,mixtral}_kv.py):
architecture differences are config flags (attn_qkv_bias → Qwen2, qk_norm →
Qwen3, num_experts>0 → Mixtral MoE), and every backend uniformly exposes the
EAGLE-3 feature taps (inputs of layers {2, L//2, L-3},
modeling_llama_kv.py:1137-1139) — unlike the reference, where Qwen2/Mixtral
lack taps.

TPU-first choices:
- Layer parameters are stacked on a leading axis and the layer loop is a
  single `lax.scan` — one trace/compile regardless of depth.
- Attention masks are explicit `[B, T, S]` boolean data over the whole
  preallocated KV buffer; the tree mask is injected by the *caller* as data,
  not by attribute side channels (cf. ea_model.py:253).
- Softmax in fp32, matmul accumulation fp32 (`preferred_element_type`), so
  the vanilla and tree decode paths are bit-identical by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.kv_cache import KVCache, update_layer, update_layer_q
from ..ops.masks import TreeMaskSpec, tree_mask_full
from .rope import apply_rope, rope_tables

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """HF-exact RMSNorm: fp32 variance, scale applied in input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * weight.astype(dtype)).astype(dtype)


def _dense(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    from ..ops.quant4 import Stacked4

    if isinstance(w, Stacked4):  # stacked int4 + in-kernel layer select
        from ..ops.quant4 import qdense4_stacked

        return qdense4_stacked(x, w, b)
    if isinstance(w, dict):  # weight-only quantization
        if "q4" in w:  # packed int4 (ops/quant4.py — Pallas kernel on TPU)
            from ..ops.quant4 import qdense4

            return qdense4(x, w, b)
        from ..ops.quant import qdense  # int8 (ops/quant.py)

        return qdense(x, w, b)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
              mask: jnp.ndarray, ks: Optional[jnp.ndarray] = None,
              vs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked multi-head attention against the full KV buffer.

    q: [B, T, nq, d]; k_cache/v_cache: [B, n_kv, S, d]; mask: [B, T, S] bool
    (True = may attend). fp32 scores + softmax (modeling_llama_kv.py:740-742).
    Returns [B, T, nq*d].

    ks/vs: optional int8-KV per-row scales [B, n_kv, S] (ops/kv_cache.py).
    The dequant never materializes: the int8→bf16 convert fuses into the dot
    operand, the K scale folds into the fp32 scores per column, and the V
    scale folds into the fp32 probs per column — per-row math identical
    between the T=1 vanilla step and the T=tree verify, so greedy
    bit-exactness holds within the int8-KV operating point.
    """
    B, T, nq, d = q.shape
    n_kv = k_cache.shape[1]
    g = nq // n_kv
    qh = jnp.swapaxes(q, 1, 2).reshape(B, n_kv, g, T, d)
    scores = jnp.einsum("bhgtd,bhsd->bhgts", qh, k_cache.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    if ks is not None:
        scores = scores * ks[:, :, None, None, :]
    scores = scores * (d ** -0.5)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if vs is not None:
        probs = probs * vs[:, :, None, None, :]
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, v_cache.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.swapaxes(out.reshape(B, nq, T, d), 1, 2).reshape(B, T, nq * d)


def _mlp_dense(h: jnp.ndarray, lp: dict) -> jnp.ndarray:
    if "w_gateup" in lp:
        # fused single-call gate|up (quantize_target_params4 fuse=True):
        # bit-identical per column, one activation-quant pass instead of 2
        gu = _dense(h, lp["w_gateup"])
        F = gu.shape[-1] // 2
        gate, up = gu[..., :F], gu[..., F:]
    else:
        gate = _dense(h, lp["w_gate"])
        up = _dense(h, lp["w_up"])
    return _dense(jax.nn.silu(gate) * up, lp["w_down"])


def _mlp_moe(h: jnp.ndarray, lp: dict, cfg: ModelConfig) -> jnp.ndarray:
    """Mixtral sparse MoE block (modeling_mixtral_kv.py:449-517).

    v1 strategy: dense dispatch — every expert computes every token, combined
    with top-k routing weights. Correct and fully static; an expert-parallel
    ragged dispatch kernel is the planned optimization.
    """
    B, T, H = h.shape
    E, k = cfg.num_experts, cfg.experts_per_token
    del B, T
    router_logits = jnp.einsum("bth,hE->btE", h, lp["router"].astype(h.dtype),
                               preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_p, top_i = jax.lax.top_k(probs, k)
    top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)  # renormalize top-k
    combine = jax.nn.one_hot(top_i, E, dtype=jnp.float32) * top_p[..., None]
    combine = jnp.sum(combine, axis=2)  # [B, T, E]
    if "we_gate4" in lp:
        # int4 experts via the expert-axis fold (quantize_target_params4):
        # gate/up are ONE stacked [H, E*F] matmul each; the router combine
        # scales the activations so the [E*F, H] down matmul also performs
        # the expert sum. Non-selected experts' rows are exactly zero
        # (combine==0) — they quantize to 0 and contribute nothing.
        Bh, Th, _ = h.shape
        gate = _dense(h, lp["we_gate4"])            # [B, T, E*F]
        up = _dense(h, lp["we_up4"])
        F = gate.shape[-1] // E
        act = jax.nn.silu(gate) * up
        act = (act.reshape(Bh, Th, E, F)
               * combine[..., None].astype(act.dtype)).reshape(Bh, Th,
                                                               E * F)
        return _dense(act, lp["we_down4"]).astype(h.dtype)   # summed over E
    if isinstance(lp["we_gate"], dict):
        # int8 expert banks (ops/quant.quantize_target_params): dynamic
        # per-token activation quantization, int8×int8 batched dots with
        # int32 accumulation, rescaled by (row ⊗ per-(expert, channel))
        # scales — the E× FFN weight streaming halves, which is the whole
        # decode cost of a Mixtral-class target
        from ..ops.quant import quantize_rows
        xq, sx = quantize_rows(h)                         # [B,T,H], [B,T,1]
        gate = (jnp.einsum("bth,ehf->btef", xq, lp["we_gate"]["q8"],
                           preferred_element_type=jnp.int32)
                .astype(jnp.float32) * sx[..., None]
                * lp["we_gate"]["scale"]).astype(h.dtype)
        up = (jnp.einsum("bth,ehf->btef", xq, lp["we_up"]["q8"],
                         preferred_element_type=jnp.int32)
              .astype(jnp.float32) * sx[..., None]
              * lp["we_up"]["scale"]).astype(h.dtype)
        aq, sa = quantize_rows(jax.nn.silu(gate) * up)    # [B,T,E,F]
        out = (jnp.einsum("btef,efh->bteh", aq, lp["we_down"]["q8"],
                          preferred_element_type=jnp.int32)
               .astype(jnp.float32) * sa * lp["we_down"]["scale"])
    else:
        gate = jnp.einsum("bth,ehf->btef", h, lp["we_gate"].astype(h.dtype),
                          preferred_element_type=jnp.float32).astype(h.dtype)
        up = jnp.einsum("bth,ehf->btef", h, lp["we_up"].astype(h.dtype),
                        preferred_element_type=jnp.float32).astype(h.dtype)
        act = jax.nn.silu(gate) * up
        out = jnp.einsum("btef,efh->bteh", act, lp["we_down"].astype(h.dtype),
                         preferred_element_type=jnp.float32)
    return jnp.sum(out * combine[..., None].astype(out.dtype), axis=2).astype(h.dtype)


def _mlp_moe_capacity(h: jnp.ndarray, lp: dict, cfg: ModelConfig) -> jnp.ndarray:
    """Capacity-based ragged MoE dispatch (GShard-style).

    The dense path (_mlp_moe) runs EVERY expert on EVERY token — optimal for
    weight-bound decode (all expert weights stream anyway) but E/k× wasted
    FLOPs for compute-bound prefill/training. Here each token is scattered
    to its top-k experts' capacity-bounded buffers [E, C, H]; experts
    compute one batched FFN; results gather back weighted by the router.
    Tokens overflowing an expert's capacity are dropped (standard GShard
    semantics; cfg.moe_capacity_factor sizes C). With experts sharded over
    "model", XLA lowers the scatter/gather to all-to-alls.
    """
    if "we_gate4" in lp:
        raise NotImplementedError(
            "int4 expert banks support dense dispatch only (the decode "
            "mode); use bf16/int8 banks with moe_impl='capacity'")
    B, T, H = h.shape
    E, k = cfg.num_experts, cfg.experts_per_token
    N = B * T
    x = h.reshape(N, H)
    router_logits = jnp.einsum("nh,hE->nE", x, lp["router"].astype(x.dtype),
                               preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_p, top_i = jax.lax.top_k(probs, k)                  # [N, k]
    top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    C = max(8, int(-(-N * k // E) * cfg.moe_capacity_factor))
    flat_e = top_i.reshape(-1)                              # [N*k]
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)
    pos = jnp.take_along_axis(jnp.cumsum(onehot, axis=0) - onehot,
                              flat_e[:, None], axis=1)[:, 0]  # rank in expert
    keep = pos < C
    x_rep = jnp.repeat(x, k, axis=0)                        # [N*k, H]
    disp = jnp.zeros((E, C, H), x.dtype)
    disp = disp.at[jnp.where(keep, flat_e, 0),
                   jnp.where(keep, pos, 0)].add(
        jnp.where(keep[:, None], x_rep, 0))
    if isinstance(lp["we_gate"], dict):
        # int8 expert banks: same rule as _mlp_moe's quantized branch, with
        # per-(expert, slot) activation rows (the dispatched buffers)
        from ..ops.quant import quantize_rows
        dq, sd = quantize_rows(disp)                      # [E,C,H], [E,C,1]
        gate = (jnp.einsum("ech,ehf->ecf", dq, lp["we_gate"]["q8"],
                           preferred_element_type=jnp.int32)
                .astype(jnp.float32) * sd
                * lp["we_gate"]["scale"][:, None, :]).astype(x.dtype)
        up = (jnp.einsum("ech,ehf->ecf", dq, lp["we_up"]["q8"],
                         preferred_element_type=jnp.int32)
              .astype(jnp.float32) * sd
              * lp["we_up"]["scale"][:, None, :]).astype(x.dtype)
        aq, sa = quantize_rows(jax.nn.silu(gate) * up)    # [E,C,F]
        out_e = (jnp.einsum("ecf,efh->ech", aq, lp["we_down"]["q8"],
                            preferred_element_type=jnp.int32)
                 .astype(jnp.float32) * sa
                 * lp["we_down"]["scale"][:, None, :])
    else:
        gate = jnp.einsum("ech,ehf->ecf", disp, lp["we_gate"].astype(x.dtype),
                          preferred_element_type=jnp.float32).astype(x.dtype)
        up = jnp.einsum("ech,ehf->ecf", disp, lp["we_up"].astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        out_e = jnp.einsum("ecf,efh->ech", jax.nn.silu(gate) * up,
                           lp["we_down"].astype(x.dtype),
                           preferred_element_type=jnp.float32)
    picked = out_e[jnp.where(keep, flat_e, 0), jnp.where(keep, pos, 0)]
    w = (top_p.reshape(-1) * keep).astype(picked.dtype)
    y = jnp.sum((picked * w[:, None]).reshape(N, k, H), axis=1)
    return y.reshape(B, T, H).astype(h.dtype)


def _layer(h: jnp.ndarray, lp: dict, cfg: ModelConfig,
           k_cache: jnp.ndarray, v_cache: jnp.ndarray,
           cos: jnp.ndarray, sin: jnp.ndarray,
           mask: jnp.ndarray, start: jnp.ndarray,
           positions=None, sliding: jnp.ndarray | None = None,
           ks_cache=None, vs_cache=None):
    """One decoder layer; returns (h, k_cache, v_cache, ks_cache, vs_cache).

    positions [B,T] + sliding (scalar bool) implement qwen2-style per-layer
    sliding-window attention: when sliding, prefix columns below
    position−window+1 are masked out (tree columns sit within ≤64 rows of
    the query and are never affected by realistic window sizes).

    ks_cache/vs_cache: int8-KV row scales [B, n_kv, S] (None for bf16
    caches) — quantize-on-write + scale-folded attention reads.
    """
    B, T, _ = h.shape
    x = rms_norm(h, lp["ln1"], cfg.rms_eps)
    if "wqkv" in lp:
        # fused single-call q|k|v (quantize_target_params4 fuse=True)
        qkv = _dense(x, lp["wqkv"], lp.get("bqkv"))
        q = qkv[..., : cfg.q_dim]
        k = qkv[..., cfg.q_dim: cfg.q_dim + cfg.kv_dim]
        v = qkv[..., cfg.q_dim + cfg.kv_dim:]
        q = q.reshape(B, T, cfg.num_q_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = _dense(x, lp["wq"], lp.get("bq")).reshape(B, T, cfg.num_q_heads, cfg.head_dim)
        k = _dense(x, lp["wk"], lp.get("bk")).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = _dense(x, lp["wv"], lp.get("bv")).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:  # Qwen3 per-head q/k RMSNorm (modeling_qwen3_kv.py:249-250)
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if ks_cache is not None:
        k_cache, v_cache, ks_cache, vs_cache = update_layer_q(
            k_cache, v_cache, ks_cache, vs_cache, k, v, start)
    else:
        k_cache, v_cache = update_layer(k_cache, v_cache, k, v, start)
    if cfg.sliding_window and sliding is not None and positions is not None:
        S_len = k_cache.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S_len), 2)
        sw_ok = col > (positions[:, :, None] - cfg.sliding_window)
        if isinstance(mask, TreeMaskSpec):
            mask = tree_mask_full(mask.tree_mask, S_len, mask.start)
        mask = mask & jnp.where(sliding, sw_ok, True)
    if isinstance(mask, TreeMaskSpec):
        # the Pallas tree kernel reads raw bf16 KV; int8 caches take the
        # XLA dense-mask path (scale-folded reads)
        if cfg.attn_impl == "pallas_tree" and ks_cache is None:
            import jax as _jax

            from ..ops.pallas_attn import tree_attention

            interp = _jax.default_backend() != "tpu"
            attn_out = jax.vmap(
                lambda qb, kc, vc, kb, vb, tm, st: tree_attention(
                    qb, kc, vc, kb, vb, tm, st, interpret=interp)
            )(q, k_cache, v_cache, k, v, mask.tree_mask, mask.start)
        else:
            dense = tree_mask_full(mask.tree_mask, k_cache.shape[2],
                                   mask.start)
            attn_out = attention(q, k_cache, v_cache, dense,
                                 ks=ks_cache, vs=vs_cache)
    else:
        attn_out = attention(q, k_cache, v_cache, mask,
                             ks=ks_cache, vs=vs_cache)
    h = h + _dense(attn_out, lp["wo"])
    x = rms_norm(h, lp["ln2"], cfg.rms_eps)
    if cfg.num_experts > 0:
        mlp_out = (_mlp_moe_capacity(x, lp, cfg)
                   if cfg.moe_impl == "capacity" else _mlp_moe(x, lp, cfg))
    else:
        mlp_out = _mlp_dense(x, lp)
    return h + mlp_out, k_cache, v_cache, ks_cache, vs_cache


class ForwardResult(NamedTuple):
    hidden: jnp.ndarray          # [B, T, H] final-norm'd hidden states
    pre_norm_hidden: jnp.ndarray  # [B, T, H] last-layer output before final norm
    taps: jnp.ndarray            # [B, T, 3*H] EAGLE-3 fused features
    cache: KVCache


def forward(params: dict, cfg: ModelConfig, tokens: jnp.ndarray, cache: KVCache,
            positions: jnp.ndarray, mask: jnp.ndarray) -> ForwardResult:
    """Run the transformer over `tokens` [B, T], appending KV at cache.length.

    positions: [B, T] int32 rope/position ids.
    mask: [B, T, S] bool attention mask over the full KV buffer (True=attend).
    """
    h = jnp.take(params["embed"]["w"], tokens, axis=0).astype(cfg.dtype)
    B, T, H = h.shape
    cos, sin = rope_tables(cfg.rope, cfg.head_dim, positions)
    start = cache.length
    tap_layers = jnp.asarray(cfg.tap_layers, jnp.int32)
    taps0 = jnp.zeros((3, B, T, H), cfg.dtype)

    if cfg.sliding_window and cfg.sliding_layer_flags:
        sw_flags = jnp.asarray(cfg.sliding_layer_flags)
    else:
        sw_flags = None

    # Stacked-int4 leaves ([L, K/8, N] packed dicts) are NOT scanned over:
    # a per-layer slice feeding a Pallas custom call must be materialized
    # by XLA (a jnp.dot fuses the slice; a custom call cannot) — profiled
    # at ~2.9 ms/step of pure weight copies on the 4B int4 target
    # (tools/profile_vanilla_int4.py). They stay whole and the kernel
    # selects the layer via a scalar-prefetch index (ops/quant4.Stacked4).
    # The blocked TP layout (4-D q4) keeps the scanned path — its
    # custom_partitioning handles sharding there.
    all_layers = params["layers"]
    stacked4 = {k: v for k, v in all_layers.items()
                if isinstance(v, dict) and "q4" in v and v["q4"].ndim == 3}
    xs_layers = {k: v for k, v in all_layers.items() if k not in stacked4}
    if stacked4:
        from ..ops.quant4 import Stacked4

    def step(carry, xs):
        h, taps = carry
        lp, k_cache, v_cache, ks_c, vs_c, idx = xs
        if stacked4:
            lp = dict(lp)
            for name, qw in stacked4.items():
                lp[name] = Stacked4(qw["q4"], qw["scale"], idx)
        taps = jnp.where((tap_layers == idx)[:, None, None, None], h[None], taps)
        sliding = sw_flags[idx] if sw_flags is not None else None
        h, k_cache, v_cache, ks_c, vs_c = _layer(
            h, lp, cfg, k_cache, v_cache, cos, sin, mask, start,
            positions=positions, sliding=sliding,
            ks_cache=ks_c, vs_cache=vs_c)
        return (h, taps), (k_cache, v_cache, ks_c, vs_c)

    # the layer index rides in xs (not the carry) so it stays UNBATCHED
    # under vmapped rounds — the stacked kernel's custom_vmap rule can
    # then flatten the batch into M instead of lax.map-ing per slot
    (h, taps), (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
        step, (h, taps0),
        (xs_layers, cache.k, cache.v, cache.ks, cache.vs,
         jnp.arange(cfg.num_layers, dtype=jnp.int32))
    )
    new_cache = KVCache(k=k_new, v=v_new, length=cache.length + T,
                        ks=ks_new, vs=vs_new)
    hidden = rms_norm(h, params["final_norm"], cfg.rms_eps)
    taps = jnp.concatenate([taps[0], taps[1], taps[2]], axis=-1)
    return ForwardResult(hidden=hidden, pre_norm_hidden=h, taps=taps, cache=new_cache)


def lm_head(params: dict, cfg: ModelConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Project hidden [.., H] → logits [.., V] (fp32)."""
    w = params["lm_head"] if not cfg.tie_embeddings else params["embed"]["w"].T
    if isinstance(w, dict):  # quantized target (ops/quant{,4}.py)
        if "q4" in w:
            from ..ops.quant4 import qdense4

            return qdense4(hidden, w, out_dtype=jnp.float32)
        from ..ops.quant import qdense

        return qdense(hidden, w, out_dtype=jnp.float32)
    return jnp.dot(hidden, w.astype(hidden.dtype),
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Initialization (random params, for tests)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    L, H, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 32))

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "ln1": jnp.ones((L, H), dtype),
        "ln2": jnp.ones((L, H), dtype),
        "wq": rnd(L, H, cfg.q_dim),
        "wk": rnd(L, H, cfg.kv_dim),
        "wv": rnd(L, H, cfg.kv_dim),
        "wo": rnd(L, cfg.q_dim, H),
    }
    if cfg.attn_qkv_bias:
        layers["bq"] = jnp.zeros((L, cfg.q_dim), dtype)
        layers["bk"] = jnp.zeros((L, cfg.kv_dim), dtype)
        layers["bv"] = jnp.zeros((L, cfg.kv_dim), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    if cfg.num_experts > 0:
        E = cfg.num_experts
        layers["router"] = rnd(L, H, E)
        layers["we_gate"] = rnd(L, E, H, F)
        layers["we_up"] = rnd(L, E, H, F)
        layers["we_down"] = rnd(L, E, F, H)
    else:
        layers["w_gate"] = rnd(L, H, F)
        layers["w_up"] = rnd(L, H, F)
        layers["w_down"] = rnd(L, F, H)

    params = {
        "embed": {"w": rnd(cfg.vocab_size, H)},
        "layers": layers,
        "final_norm": jnp.ones((H,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = rnd(H, cfg.vocab_size)
    return params
