"""EAGLE draft heads ("cnets"), functional JAX.

One module covers both generations:

- version=1 (EAGLE-1/2, /root/reference/eagle/model/cnets1.py): the input is
  `fc(concat(embed(tokens), target_feature))` (cnets1.py:623) followed by N
  standard decoder layers (layer 0 has no input_layernorm,
  cnets1.py:399,428-430); drafting scores are produced by the *target's*
  lm_head applied to the raw draft hidden (cnets1.py:702,732).

- version=3 (EAGLE-3, /root/reference/eagle/model/cnets.py): the fused
  3-tap feature is projected by `fc(3h→h)` only when its width differs from
  the embedding width (cnets.py:639-640); the single decoder layer's QKV
  projects from `concat(rmsnorm(emb), rmsnorm(hidden))` — a 2h-wide input
  (cnets.py:209-211,425-430) — and the head is the draft's own
  reduced-vocab `lm_head(norm(h))` with d2t/t2d vocab maps
  (cnets.py:487,538-541,701-713).

The draft KV cache reuses the same preallocated KVCache as the target.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DraftConfig
from ..ops.kv_cache import KVCache, update_layer
from .rope import apply_rope, rope_tables
from .transformer import attention, rms_norm, _dense


def _mlp(h: jnp.ndarray, lp: dict) -> jnp.ndarray:
    if "wgu" in lp:  # fused gate|up (fuse_projections)
        F = lp["w_down"].shape[-2] if not isinstance(lp["w_down"], dict) \
            else _quant_in_dim(lp["w_down"])
        gu = _dense(h, lp["wgu"])
        gate, up = gu[..., :F], gu[..., F:]
    else:
        gate, up = _dense(h, lp["w_gate"]), _dense(h, lp["w_up"])
    return _dense(jax.nn.silu(gate) * up, lp["w_down"])


def _quant_in_dim(w: dict) -> int:
    """Contraction dim of a quantized leaf ({"q8"} or packed {"q4"})."""
    if "q8" in w:
        return w["q8"].shape[-2]
    from ..ops.quant4 import _k_of
    return _k_of(w)


def _attn_block(x: jnp.ndarray, lp: dict, cfg: DraftConfig,
                k_cache, v_cache, cos, sin, mask, start):
    """QKV → rope → cache append → masked attention → o_proj."""
    B, T, _ = x.shape
    if "wqkv" in lp:  # fused q|k|v (fuse_projections): one weight stream
        qd, kvd = cfg.q_dim, cfg.kv_dim
        qkv = _dense(x, lp["wqkv"], lp.get("bqkv"))
        q = qkv[..., :qd].reshape(B, T, cfg.num_q_heads, cfg.head_dim)
        k = qkv[..., qd:qd + kvd].reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = qkv[..., qd + kvd:].reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = _dense(x, lp["wq"], lp.get("bq")).reshape(B, T, cfg.num_q_heads, cfg.head_dim)
        k = _dense(x, lp["wk"], lp.get("bk")).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = _dense(x, lp["wv"], lp.get("bv")).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k_cache, v_cache = update_layer(k_cache, v_cache, k, v, start)
    out = attention(q, k_cache, v_cache, mask)
    return _dense(out, lp["wo"]), k_cache, v_cache


def fuse_projections(dparams: dict) -> dict:
    """Concatenate each layer's q/k/v (and gate/up) projection weights
    along the output axis: wqkv [in, q_dim+2·kv_dim], wgu [H, 2F].

    Inference-time transform (the engine applies it at init, before draft
    quantization): the beam loop then streams ONE weight tensor and issues
    ONE matmul dispatch where it issued three — at beam shapes (≤10 rows)
    those matmuls are dispatch/streaming-bound, so call count is the cost.
    Numerics: per-output-column work is unchanged (same contraction, same
    K order) — bitwise identical for int8/int4 drafts (integer dots +
    per-column scales), and identical for bf16 on the MXU's K-sequential
    accumulation. Idempotent; training/export always use the unfused tree
    (reference cnets naming, hf_loader/checkpoint round-trips)."""
    if not dparams.get("layers") or all(
            "wqkv" in lp or isinstance(lp.get("wq"), dict)
            for lp in dparams["layers"]):
        return dparams  # nothing fusable left (fused and/or quantized)
    out = dict(dparams)
    layers = []
    for lp in dparams["layers"]:
        if "wqkv" in lp or isinstance(lp.get("wq"), dict):
            layers.append(lp)  # already fused / quantized: skip
            continue
        nlp = dict(lp)
        nlp["wqkv"] = jnp.concatenate(
            [nlp.pop("wq"), nlp.pop("wk"), nlp.pop("wv")], axis=-1)
        n_bias = sum(k in nlp for k in ("bq", "bk", "bv"))
        if n_bias == 3:
            nlp["bqkv"] = jnp.concatenate(
                [nlp.pop("bq"), nlp.pop("bk"), nlp.pop("bv")], axis=-1)
        elif n_bias:  # fail loudly — fusing would silently drop the bias
            raise ValueError(
                "fuse_projections: layer has a partial q/k/v bias set "
                f"({n_bias}/3); init/loader invariants are all-or-none")
        if not isinstance(nlp.get("w_gate"), dict):
            nlp["wgu"] = jnp.concatenate(
                [nlp.pop("w_gate"), nlp.pop("w_up")], axis=-1)
        layers.append(nlp)
    out["layers"] = layers
    return out


class DraftResult(NamedTuple):
    hidden: jnp.ndarray  # [B, T, H]
    cache: KVCache


def forward(params: dict, cfg: DraftConfig, tokens: jnp.ndarray,
            feature: jnp.ndarray, cache: KVCache, positions: jnp.ndarray,
            mask: jnp.ndarray) -> DraftResult:
    """Draft forward over T positions.

    tokens: [B, T] int32; feature: [B, T, F] — the target feature (v1: H-wide
    final hidden; v3: 3H-wide fused taps on the first call of a round, H-wide
    prior draft hidden on beam steps). positions: [B, T]; mask: [B, T, S].
    """
    emb = jnp.take(params["embed"]["w"], tokens, axis=0).astype(cfg.dtype)
    cos, sin = rope_tables(cfg.rope, cfg.head_dim, positions)
    start = cache.length
    feature = feature.astype(cfg.dtype)

    if cfg.version == 1:
        h = _dense(jnp.concatenate([emb, feature], axis=-1), params["fc"]["w"],
                   params["fc"].get("b"))
        k_caches, v_caches = [], []
        for i in range(cfg.num_layers):
            lp = params["layers"][i]
            residual = h
            x = h if i == 0 else rms_norm(h, lp["ln1"], cfg.rms_eps)
            attn_out, kc, vc = _attn_block(x, lp, cfg, cache.k[i], cache.v[i],
                                           cos, sin, mask, start)
            h = residual + attn_out
            h = h + _mlp(rms_norm(h, lp["ln2"], cfg.rms_eps), lp)
            k_caches.append(kc)
            v_caches.append(vc)
        new_cache = KVCache(k=jnp.stack(k_caches), v=jnp.stack(v_caches),
                            length=cache.length + tokens.shape[1])
        return DraftResult(hidden=h, cache=new_cache)

    # version == 3: single fused layer
    lp = params["layers"][0]
    # fc applied only when the feature is wider than the hidden (cnets.py:639)
    h = feature
    if feature.shape[-1] != cfg.hidden_size:
        h = _dense(feature, params["fc"]["w"])
    residual = h
    hn = rms_norm(h, lp["hidden_norm"], cfg.rms_eps)
    en = rms_norm(emb, lp["ln1"], cfg.rms_eps)
    x2 = jnp.concatenate([en, hn], axis=-1)  # [B, T, 2H]
    attn_out, kc, vc = _attn_block(x2, lp, cfg, cache.k[0], cache.v[0],
                                   cos, sin, mask, start)
    h = residual + attn_out
    h = h + _mlp(rms_norm(h, lp["ln2"], cfg.rms_eps), lp)
    new_cache = KVCache(k=kc[None], v=vc[None], length=cache.length + tokens.shape[1])
    return DraftResult(hidden=h, cache=new_cache)


def draft_logits(params: dict, cfg: DraftConfig, hidden: jnp.ndarray,
                 target_lm_head: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Draft scoring head → fp32 logits over the draft vocab.

    v1: the target's lm_head applied to the raw draft hidden
    (cnets1.py:702,732). v3: own lm_head over norm(h) (cnets.py:701).
    """
    if cfg.version == 1:
        assert target_lm_head is not None
        if isinstance(target_lm_head, dict):  # int8 target lm_head
            return _dense(hidden, target_lm_head).astype(jnp.float32)
        return jnp.dot(hidden, target_lm_head.astype(hidden.dtype),
                       preferred_element_type=jnp.float32)
    h = rms_norm(hidden, params["norm"], cfg.rms_eps)
    if isinstance(params["lm_head"], dict):  # int8 (ops/quant.py)
        return _dense(h, params["lm_head"]).astype(jnp.float32)
    return jnp.dot(h, params["lm_head"].astype(h.dtype),
                   preferred_element_type=jnp.float32)


def map_draft_to_target(params: dict, cfg: DraftConfig, draft_ids: jnp.ndarray) -> jnp.ndarray:
    """Map reduced-draft-vocab ids to target-vocab ids via the d2t offset
    buffer (cnets.py:708-713). Identity when vocabularies coincide."""
    if cfg.version == 3 and cfg.draft_vocab_size and cfg.draft_vocab_size != cfg.vocab_size:
        return draft_ids + params["d2t"][draft_ids]
    return draft_ids


# ---------------------------------------------------------------------------
# Initialization (random params, for tests)
# ---------------------------------------------------------------------------

def init_params(cfg: DraftConfig, key: jax.Array, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    H, F = cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    def layer(i: int) -> dict:
        in_w = 2 * H if cfg.version == 3 else H
        lp = {
            "wq": rnd(in_w, cfg.q_dim),
            "wk": rnd(in_w, cfg.kv_dim),
            "wv": rnd(in_w, cfg.kv_dim),
            "wo": rnd(cfg.q_dim, H),
            "ln2": jnp.ones((H,), dtype),
            "w_gate": rnd(H, F),
            "w_up": rnd(H, F),
            "w_down": rnd(F, H),
        }
        if cfg.attn_qkv_bias:
            lp["bq"] = jnp.zeros((cfg.q_dim,), dtype)
            lp["bk"] = jnp.zeros((cfg.kv_dim,), dtype)
            lp["bv"] = jnp.zeros((cfg.kv_dim,), dtype)
        if cfg.version == 3:
            lp["hidden_norm"] = jnp.ones((H,), dtype)
            lp["ln1"] = jnp.ones((H,), dtype)
        elif i != 0:
            lp["ln1"] = jnp.ones((H,), dtype)
        return lp

    params = {
        "embed": {"w": rnd(cfg.vocab_size, H)},
        "layers": [layer(i) for i in range(cfg.num_layers if cfg.version == 1 else 1)],
        "fc": {"w": rnd(cfg.fuse_in_dim, H)},
    }
    if cfg.version == 1:
        params["fc"]["b"] = jnp.zeros((H,), dtype)
    if cfg.version == 3:
        params["norm"] = jnp.ones((H,), dtype)
        params["lm_head"] = rnd(H, cfg.effective_draft_vocab)
        if cfg.draft_vocab_size and cfg.draft_vocab_size != cfg.vocab_size:
            # identity-ish maps for tests: draft vocab = first dv ids
            params["d2t"] = jnp.zeros((cfg.draft_vocab_size,), jnp.int32)
            t2d = jnp.zeros((cfg.vocab_size,), bool).at[: cfg.draft_vocab_size].set(True)
            params["t2d"] = t2d
    return params
