"""EAGLE-3 training-time-test (TTT) trainer — JAX/optax, mesh-sharded.

Reference: /root/reference/eagle/traineagle3/ (main.py + cnets.py). Per batch:
1. A frozen target model runs once, producing the fused 3-tap feature
   (layers {2, L//2, L-3} inputs) and the target logits
   (traineagle3/cnets.py:713-731 `dataprepare`; left-shifted by one).
2. The draft head unrolls `length`(=7) recursive steps; step s re-embeds
   tokens shifted left by s+1 and attends with the *diagonal multi-step
   attention* (traineagle3/cnets.py:227-314): causal over step-0 keys plus
   one extra logit column per earlier step — the key of step i at the SAME
   sequence position — with rope positions offset by the step index.
3. Step loss = soft CE of draft logits vs the target's softmax restricted to
   the draft vocab (t2d), masked where the target argmax falls outside the
   draft vocab (cnets.py:831-855); total = Σ 0.8^s · ploss_s (main.py:284).

TPU-native differences: the step loop is a compile-time unroll over a fixed
`length` with stacked K/V tensors (no Python list caches); the frozen target
runs in the same jitted step; data parallelism is a mesh axis (gradients
psum-ed by XLA), replacing DeepSpeed ZeRO-2/NCCL (ds_config.json:32-41);
optimizer = optax AdamW(0.9, 0.95) + warmup-decay + global-norm clip 0.5,
matching traineagle3/ds_config.json:18-31.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import DraftConfig, ModelConfig
from ..models import transformer
from ..models.rope import apply_rope, rope_tables
from ..models.transformer import _dense, rms_norm
from ..ops.kv_cache import init_cache
from ..ops.masks import prefill_mask

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    length: int = 7            # TTT recursive steps (traineagle3/cnets.py:498)
    step_decay: float = 0.8    # loss weight 0.8^s (main.py:284-285)
    lr: float = 5e-5
    warmup_steps: int = 200
    total_steps: int = 20000
    b1: float = 0.9
    b2: float = 0.95
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    # quantization-aware distillation: run the draft forward through STE
    # fake-quantized weights so the quantized-deployed draft keeps its τ.
    # False | True/"int8" (ops/quant.fake_quantize_draft_params, for
    # EngineConfig.draft_quant="int8") | "int4" (group-128 packed nibbles,
    # ops/quant4.fake_quantize4_draft_params, for draft_quant="int4")
    quant_aware: object = False


class TTTMetrics(NamedTuple):
    loss: jnp.ndarray       # scalar weighted total
    plosses: jnp.ndarray    # [length]
    accs: jnp.ndarray       # [length] per-step argmax agreement


def _shift_left(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """padding(left=False): drop first element, append zero (cnets.py:860-864)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(x, pad)[
        tuple(slice(1, None) if a == axis else slice(None) for a in range(x.ndim))
    ]


def _diag_attention(q: jnp.ndarray, k_all: jnp.ndarray, v_all: jnp.ndarray,
                    step: int, base_mask: jnp.ndarray) -> jnp.ndarray:
    """Diagonal multi-step attention for TTT step `step`.

    q: [B, T, nq, d] (this step's rope-rotated queries)
    k_all/v_all: [L_steps, B, T, nq, d] — per-step keys/values (kv heads
        already repeated to nq), rows > step are zeros/unused.
    base_mask: [B, T, T] bool causal(+padding) mask for step-0 keys.
    Returns [B, T, nq*d].

    Scores = [causal q·k0  |  diag(q·k_i) for i = 1..step], softmax fp32 over
    the concatenated axis (traineagle3/cnets.py:278-311).
    """
    B, T, nq, d = q.shape
    L = k_all.shape[0]
    scale = d ** -0.5
    s0 = jnp.einsum("btnd,bsnd->bnts", q, k_all[0],
                    preferred_element_type=jnp.float32) * scale
    s0 = jnp.where(base_mask[:, None], s0, NEG_INF)
    # diagonal logits vs steps 1..L-1 at the same position
    sd = jnp.einsum("btnd,lbtnd->bntl", q, k_all[1:],
                    preferred_element_type=jnp.float32) * scale  # [B,nq,T,L-1]
    step_ok = (jnp.arange(1, L) <= step)[None, None, None, :]
    sd = jnp.where(step_ok, sd, NEG_INF)
    scores = jnp.concatenate([s0, sd], axis=-1)          # [B,nq,T,T+L-1]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    p0, pd = probs[..., :T], probs[..., T:]
    out = jnp.einsum("bnts,bsnd->btnd", p0, v_all[0].astype(jnp.float32))
    out = out + jnp.einsum("bntl,lbtnd->btnd", pd,
                           v_all[1:].astype(jnp.float32))
    return out.reshape(B, T, nq * d).astype(q.dtype)


def ttt_forward(dparams: dict, dcfg: DraftConfig, taps: jnp.ndarray,
                input_ids: jnp.ndarray, target_logits: jnp.ndarray,
                loss_mask: jnp.ndarray, pad_mask: jnp.ndarray,
                tcfg: TrainConfig) -> TTTMetrics:
    """Run `length` TTT steps; return losses/metrics.

    taps: [B, T, 3H] fused target features (UNshifted).
    input_ids / target_logits: already left-shifted once by the caller
    (dataprepare semantics): input_ids[t] = token t+1, target_logits[t] =
    target's logits at position t+1.
    loss_mask: [B, T] — passed UNSHIFTED; this function shifts it at the
    end of each step internally (matching the reference dataprepare, which
    only shifts the mask per step — traineagle3/cnets.py loss loop).
    pad_mask: [B, T] bool — True at real (non-padding) positions.
    """
    lp = dparams["layers"][0]
    B, T = input_ids.shape
    dt = dcfg.dtype
    h = _dense(taps.astype(dt), dparams["fc"]["w"])       # fc(3H→H)

    # base causal+padding mask over step-0 keys
    causal = jnp.tril(jnp.ones((T, T), bool))
    base_mask = causal[None] & pad_mask[:, None, :]

    nq, nkv, d = dcfg.num_q_heads, dcfg.num_kv_heads, dcfg.head_dim
    Ls = tcfg.length
    k_all = jnp.zeros((Ls, B, T, nq, d), dt)
    v_all = jnp.zeros((Ls, B, T, nq, d), dt)

    # draft-vocab restriction (cnets.py:840-848); identity when the draft
    # uses the full vocab — gathering [B,T,V] by arange would double peak HBM
    reduced = bool(dcfg.draft_vocab_size
                   and dcfg.draft_vocab_size != dcfg.vocab_size)
    dV = dcfg.effective_draft_vocab
    if reduced:
        d2t_ids = jnp.arange(dV, dtype=jnp.int32) + dparams["d2t"]
        t2d = dparams["t2d"]

    def ttt_step(s, h, k_all, v_all, ids, tgt, lmask):
        emb = jnp.take(dparams["embed"]["w"], ids, axis=0).astype(dt)
        # decoder layer with concat(norm(emb), norm(hidden)) input
        residual = h
        hn = rms_norm(h, lp["hidden_norm"], dcfg.rms_eps)
        en = rms_norm(emb, lp["ln1"], dcfg.rms_eps)
        x2 = jnp.concatenate([en, hn], axis=-1)
        q = _dense(x2, lp["wq"]).reshape(B, T, nq, d)
        k = _dense(x2, lp["wk"]).reshape(B, T, nkv, d)
        v = _dense(x2, lp["wv"]).reshape(B, T, nkv, d)
        pos = jnp.arange(T, dtype=jnp.int32)[None] + s    # rope offset by step
        cos, sin = rope_tables(dcfg.rope, d, pos)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        k_all = k_all.at[s].set(k)
        v_all = v_all.at[s].set(v)
        attn = _diag_attention(q, k_all, v_all, s, base_mask)
        h_out = residual + _dense(attn, lp["wo"])
        mlp_in = rms_norm(h_out, lp["ln2"], dcfg.rms_eps)
        gate = _dense(mlp_in, lp["w_gate"])
        up = _dense(mlp_in, lp["w_up"])
        h_out = h_out + _dense(jax.nn.silu(gate) * up, lp["w_down"])

        # loss (cnets.py:831-855)
        logits = jnp.dot(rms_norm(h_out, dparams["norm"], dcfg.rms_eps),
                         dparams["lm_head"].astype(dt),
                         preferred_element_type=jnp.float32)  # [B,T,dV]
        tgt_f = tgt.astype(jnp.float32)
        tgt_argmax = jnp.argmax(tgt_f, axis=-1)
        if reduced:
            pos_mask = (t2d[tgt_argmax] & (lmask > 0)).astype(jnp.float32)
            tgt_restricted = tgt_f[..., d2t_ids]
        else:
            pos_mask = (lmask > 0).astype(jnp.float32)
            tgt_restricted = tgt_f
        target_p = jax.lax.stop_gradient(
            jax.nn.softmax(tgt_restricted, axis=-1))
        out_logp = jax.nn.log_softmax(logits, axis=-1)
        ploss = -jnp.mean(jnp.sum(target_p * out_logp, axis=-1) * pos_mask)
        acc = jnp.sum((jnp.argmax(logits, -1) == jnp.argmax(target_p, -1))
                      * pos_mask) / (jnp.sum(lmask) + 1e-6)
        return h_out, k_all, v_all, ploss, acc

    plosses, accs = [], []
    ids, tgt, lmask = input_ids, target_logits, loss_mask
    for s in range(Ls):
        # rematerialize each step's activations in the backward pass: the
        # per-step [B,T,V] logits/softmax temporaries dominate peak HBM
        # (the reference reaches for torch checkpointing the same way,
        # traineagle3/cnets.py:800-812)
        h, k_all, v_all, ploss, acc = jax.checkpoint(
            ttt_step, static_argnums=(0,))(s, h, k_all, v_all, ids, tgt,
                                           lmask)
        plosses.append(ploss)
        accs.append(acc)
        ids = _shift_left(ids)
        tgt = _shift_left(tgt)
        lmask = _shift_left(lmask)

    plosses = jnp.stack(plosses)
    weights = tcfg.step_decay ** jnp.arange(Ls, dtype=jnp.float32)
    total = jnp.sum(weights * plosses)
    return TTTMetrics(loss=total, plosses=plosses, accs=jnp.stack(accs))


def target_features(params: dict, cfg: ModelConfig, input_ids: jnp.ndarray,
                    pad_mask: jnp.ndarray):
    """Frozen target forward → (taps [B,T,3H], logits [B,T,V]); dataprepare
    analog (traineagle3/cnets.py:713-731) without the host round-trip."""
    B, T = input_ids.shape
    cache = init_cache(cfg.num_layers, B, cfg.num_kv_heads, T, cfg.head_dim,
                       dtype=cfg.dtype)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    mask = prefill_mask(T, T, cache.length) & pad_mask[:, None, :]
    res = transformer.forward(params, cfg, input_ids, cache, pos, mask)
    logits = transformer.lm_head(params, cfg, res.hidden)
    return res.taps, logits


FROZEN_KEYS = ("embed", "d2t", "t2d")  # cnets.py:543-544 freezes embed;
                                       # d2t/t2d are integer buffers


def partition_trainable(dparams: dict) -> tuple[dict, dict]:
    trainable = {k: v for k, v in dparams.items() if k not in FROZEN_KEYS}
    frozen = {k: v for k, v in dparams.items() if k in FROZEN_KEYS}
    return trainable, frozen


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, tcfg.warmup_steps, tcfg.total_steps, tcfg.lr * 0.1)
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(sched, b1=tcfg.b1, b2=tcfg.b2,
                    weight_decay=tcfg.weight_decay),
    )


def train_step(dparams: dict, opt_state, target_params: dict,
               cfg: ModelConfig, dcfg: DraftConfig, tcfg: TrainConfig,
               optimizer, batch: dict):
    """One full TTT training step (jit/pjit this).

    batch: input_ids [B,T] int32, loss_mask [B,T] f32, pad_mask [B,T] bool.
    Returns (new_dparams, new_opt_state, metrics).
    """
    taps, logits = target_features(target_params, cfg, batch["input_ids"],
                                   batch["pad_mask"])
    taps = jax.lax.stop_gradient(taps)
    # teacher logits stored in the model dtype (bf16): the fp32 copies
    # otherwise dominate peak HBM across the unrolled TTT steps
    logits = jax.lax.stop_gradient(logits).astype(cfg.dtype)
    # dataprepare's single left shift (cnets.py:724-725)
    ids = _shift_left(batch["input_ids"])
    tgt = _shift_left(logits)
    lmask = batch["loss_mask"]

    trainable, frozen = partition_trainable(dparams)

    def loss_fn(tp):
        dp = {**tp, **frozen}
        if tcfg.quant_aware == "int4":
            from ..ops.quant4 import fake_quantize4_draft_params
            dp = fake_quantize4_draft_params(dp)
        elif tcfg.quant_aware in (True, "int8"):
            from ..ops.quant import fake_quantize_draft_params
            dp = fake_quantize_draft_params(dp)
        elif tcfg.quant_aware:  # typo -> would silently train int8 QAT
            raise ValueError(f"unknown quant_aware {tcfg.quant_aware!r}")
        m = ttt_forward(dp, dcfg, taps, ids, tgt, lmask,
                        batch["pad_mask"], tcfg)
        return m.loss, m

    grads, metrics = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, opt_state = optimizer.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return {**trainable, **frozen}, opt_state, metrics
