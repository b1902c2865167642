"""EAGLE-1/2 offline feature-regression trainer + feature-dump tool.

Reference: /root/reference/eagle/train/main.py. The draft (cnets1) is trained
on precomputed target features: sample = {hidden_state [T,H], input_ids [T],
loss_mask [T]}; inputs are the pair (feature_t, token_{t+1}) and the loss is

    loss = v_w · SmoothL1(predict_t, feature_{t+1})
         + p_w · softCE(head(predict_t), softmax(head(feature_{t+1})))

with v_w=1.0, p_w=0.1 (train/main.py:23-24, compute_loss:231-238), the
frozen target lm_head as `head`, optional uniform/gaussian feature noise
(main.py:109-131), and AdamW(0.9, 0.95) + warmup + grad-clip 0.5.

The "Generate Train Data" step referenced by the reference README has no
script in the snapshot (SURVEY.md §2.2 note); `dump_features` fills that gap:
it runs the target over tokenized conversations and saves
{hidden_state, input_ids, loss_mask} shards.

Metrics mirror the reference: top-k agreement with the target head
(main.py:214-229) and `getkacc` k-step rollout accuracy (main.py:240-293).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DraftConfig, ModelConfig
from ..models import draft as draft_mod
from ..models import transformer
from ..ops.kv_cache import init_cache
from ..ops.masks import prefill_mask


@dataclasses.dataclass(frozen=True)
class OfflineTrainConfig:
    v_w: float = 1.0
    p_w: float = 0.1
    lr: float = 3e-5
    warmup_steps: int = 2000
    total_steps: int = 800_000
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 0.5
    weight_decay: float = 0.0
    noise: str = "uniform"       # "uniform" | "gaussian" | "none"
    noise_std: float = 0.2
    max_len: int = 2048
    # quantization-aware training: run the draft forward through STE
    # fake-quantized weights so the quantized-deployed head keeps its
    # accuracy. False | True/"int8" | "int4" — same contract as
    # ttt.TrainConfig.quant_aware.
    quant_aware: object = False


class OfflineMetrics(NamedTuple):
    loss: jnp.ndarray
    vloss: jnp.ndarray
    ploss: jnp.ndarray
    top1: jnp.ndarray
    top3: jnp.ndarray


def _smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def add_feature_noise(key: jax.Array, feats: jnp.ndarray,
                      ocfg: OfflineTrainConfig) -> jnp.ndarray:
    """Data augmentation on input features (main.py:109-131)."""
    T = feats.shape[1]
    if ocfg.noise == "uniform":
        n = (jax.random.uniform(key, feats.shape) - 0.5) * ocfg.noise_std \
            * 512 / T
    elif ocfg.noise == "gaussian":
        n = jax.random.normal(key, feats.shape) * ocfg.noise_std
    else:
        return feats
    return feats + n.astype(feats.dtype)


def draft_train_forward(dparams: dict, dcfg: DraftConfig,
                        input_ids: jnp.ndarray, feats: jnp.ndarray,
                        pad_mask: jnp.ndarray) -> jnp.ndarray:
    """Full-sequence causal draft forward (no incremental cache)."""
    B, T = input_ids.shape
    cache = init_cache(dcfg.num_layers, B, dcfg.num_kv_heads, T,
                       dcfg.head_dim, dtype=dcfg.dtype)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    mask = prefill_mask(T, T, cache.length) & pad_mask[:, None, :]
    return draft_mod.forward(dparams, dcfg, input_ids, feats, cache, pos,
                             mask).hidden


def offline_loss(dparams: dict, dcfg: DraftConfig, head_w: jnp.ndarray,
                 batch: dict, ocfg: OfflineTrainConfig,
                 key: Optional[jax.Array] = None):
    """batch: input_ids [B,T] (already shifted: token t+1), feats [B,T,H]
    (feature t), target_feats [B,T,H] (feature t+1), loss_mask [B,T],
    pad_mask [B,T]."""
    feats = batch["feats"]
    if key is not None and ocfg.noise != "none":
        feats = add_feature_noise(key, feats, ocfg)
    if ocfg.quant_aware == "int4":
        from ..ops.quant4 import fake_quantize4_draft_params
        dparams = fake_quantize4_draft_params(dparams)
    elif ocfg.quant_aware in (True, "int8"):
        from ..ops.quant import fake_quantize_draft_params
        dparams = fake_quantize_draft_params(dparams)
    elif ocfg.quant_aware:  # typo -> would silently train int8 QAT
        raise ValueError(f"unknown quant_aware {ocfg.quant_aware!r}")
    predict = draft_train_forward(dparams, dcfg, batch["input_ids"], feats,
                                  batch["pad_mask"])
    target = batch["target_feats"]
    lm = batch["loss_mask"][..., None]

    vloss = jnp.sum(jnp.mean(lm * _smooth_l1(
        predict.astype(jnp.float32), target.astype(jnp.float32)), axis=2)) \
        / (jnp.sum(batch["loss_mask"]) + 1e-5)

    out_head = jnp.dot(predict, head_w.astype(predict.dtype),
                       preferred_element_type=jnp.float32)
    tgt_head = jnp.dot(target, head_w.astype(target.dtype),
                       preferred_element_type=jnp.float32)
    target_p = jax.lax.stop_gradient(jax.nn.softmax(tgt_head, axis=-1))
    out_logp = jax.nn.log_softmax(out_head, axis=-1)
    ploss = -jnp.sum(lm * target_p * out_logp) / (jnp.sum(batch["loss_mask"])
                                                  + 1e-5)
    loss = ocfg.v_w * vloss + ocfg.p_w * ploss

    # top-k agreement (main.py:214-229)
    pred_ids = jnp.argsort(out_head, axis=-1)[..., ::-1][..., :3]
    tgt_id = jnp.argmax(tgt_head, axis=-1)
    hits = pred_ids == tgt_id[..., None]
    m = batch["loss_mask"]
    denom = jnp.sum(m) + 1e-5
    top1 = jnp.sum(hits[..., 0] * m) / denom
    top3 = jnp.sum(jnp.any(hits, -1) * m) / denom
    return loss, OfflineMetrics(loss=loss, vloss=vloss, ploss=ploss,
                                top1=top1, top3=top3)


def make_optimizer(ocfg: OfflineTrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, ocfg.lr, ocfg.warmup_steps, ocfg.total_steps, ocfg.lr * 0.05)
    return optax.chain(
        optax.clip_by_global_norm(ocfg.grad_clip),
        optax.adamw(sched, b1=ocfg.b1, b2=ocfg.b2,
                    weight_decay=ocfg.weight_decay),
    )


FROZEN_KEYS = ("embed",)


def partition_trainable(dparams: dict):
    trainable = {k: v for k, v in dparams.items() if k not in FROZEN_KEYS}
    frozen = {k: v for k, v in dparams.items() if k in FROZEN_KEYS}
    return trainable, frozen


def train_step(dparams: dict, opt_state, head_w: jnp.ndarray,
               dcfg: DraftConfig, ocfg: OfflineTrainConfig, optimizer,
               batch: dict, key: jax.Array):
    trainable, frozen = partition_trainable(dparams)

    def loss_fn(tp):
        return offline_loss({**tp, **frozen}, dcfg, head_w, batch, ocfg, key)

    grads, metrics = jax.grad(loss_fn, has_aux=True)(trainable)
    updates, opt_state = optimizer.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return {**trainable, **frozen}, opt_state, metrics


def getkacc(dparams: dict, dcfg: DraftConfig, head_w: jnp.ndarray,
            batch: dict, k: int = 5) -> np.ndarray:
    """k-step rollout accuracy (main.py:240-293): roll the draft forward k
    times feeding back its own argmax tokens + predicted features; report
    per-step agreement with the target head's argmax on true features."""
    feats = batch["feats"]
    ids = batch["input_ids"]
    target = batch["target_feats"]
    m = batch["loss_mask"]
    B, T = ids.shape
    accs = []
    cur_feats, cur_ids = feats, ids
    for step in range(k):
        predict = draft_train_forward(dparams, dcfg, cur_ids, cur_feats,
                                      batch["pad_mask"])
        out_head = jnp.dot(predict, head_w.astype(predict.dtype),
                           preferred_element_type=jnp.float32)
        tgt_head = jnp.dot(target, head_w.astype(target.dtype),
                           preferred_element_type=jnp.float32)
        valid = m * (jnp.arange(T)[None] < T - step)
        acc = jnp.sum((jnp.argmax(out_head, -1) == jnp.argmax(tgt_head, -1))
                      * valid) / (jnp.sum(valid) + 1e-5)
        accs.append(float(acc))
        # feed back predictions (shift the frame one step forward)
        cur_ids = jnp.roll(cur_ids, -1, axis=1).at[:, -1].set(0)
        nxt = jnp.argmax(out_head, -1).astype(jnp.int32)
        cur_ids = jnp.where(m > 0, nxt, cur_ids)
        cur_feats = predict
        target = jnp.roll(target, -1, axis=1)
    return np.asarray(accs)


# ---------------------------------------------------------------------------
# Feature dumping (the tool missing from the reference snapshot)
# ---------------------------------------------------------------------------

def dump_features(params: dict, cfg: ModelConfig, sequences: Iterable[dict],
                  out_dir: str, batch_pad: int = 128) -> int:
    """Run the frozen target over tokenized samples and write
    {hidden_state, input_ids, loss_mask} .npz shards consumable by
    `load_feature_dataset` (train/main.py:144-148 field contract)."""
    os.makedirs(out_dir, exist_ok=True)
    fwd = jax.jit(
        lambda p, t, pos, mask, cache: transformer.forward(
            p, cfg, t, cache, pos, mask).hidden,
        static_argnames=())
    n = 0
    for sample in sequences:
        ids = np.asarray(sample["input_ids"], np.int32)
        lm = np.asarray(sample["loss_mask"], np.float32)
        T = len(ids)
        Tp = -(-T // batch_pad) * batch_pad
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :T] = ids
        cache = init_cache(cfg.num_layers, 1, cfg.num_kv_heads, Tp,
                           cfg.head_dim, dtype=cfg.dtype)
        pos = jnp.arange(Tp, dtype=jnp.int32)[None]
        mask = prefill_mask(Tp, Tp, cache.length)
        hidden = np.asarray(fwd(params, jnp.asarray(padded), pos, mask,
                                cache)[0, :T], np.float32)
        np.savez(os.path.join(out_dir, f"sample_{n:08d}.npz"),
                 hidden_state=hidden, input_ids=ids, loss_mask=lm)
        n += 1
    return n


def _load_shifted(f, max_len: int):
    """One dumped shard → shifted (ids, feats, target, loss_mask) arrays
    (CustomDataset, train/main.py:134-175: shift ids/features left by one)."""
    d = np.load(f)
    hs = d["hidden_state"][:max_len]
    ids = d["input_ids"][:max_len]
    lm = d["loss_mask"][:max_len].astype(np.float32).copy()
    ids_shift = np.concatenate([ids[1:], [0]])
    target = np.concatenate([hs[1:], np.zeros((1, hs.shape[1]), hs.dtype)])
    lm[-1] = 0.0
    return ids_shift, hs, target, lm


def load_feature_dataset(path: str, max_len: int = 2048):
    """Yield training batches of size 1 from dumped shards."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npz"))
    for f in files:
        ids_shift, hs, target, lm = _load_shifted(f, max_len)
        T = len(ids_shift)
        yield {
            "input_ids": jnp.asarray(ids_shift[None]),
            "feats": jnp.asarray(hs[None]),
            "target_feats": jnp.asarray(target[None]),
            "loss_mask": jnp.asarray(lm[None]),
            "pad_mask": jnp.ones((1, T), bool),
        }


def load_feature_dataset_batched(path: str, batch_size: int,
                                 max_len: int = 2048, pad_to: int = 0,
                                 shuffle_seed: Optional[int] = None):
    """Yield fixed-shape batches of `batch_size` from dumped shards
    (DataLoader + paddingtensor collate, train/main.py:176-212 analog).

    Samples are right-padded to `pad_to` (or the batch max rounded up to a
    128 quantum when 0 — one compile per length bucket). A trailing partial
    batch is padded by repeating the last sample with a zero loss mask."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npz"))
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        rng.shuffle(files)
    for i in range(0, len(files), batch_size):
        chunk = [_load_shifted(f, max_len) for f in files[i:i + batch_size]]
        n_real = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        lens = [len(c[0]) for c in chunk]
        T = pad_to or min(max_len, -(-max(lens) // 128) * 128)
        H = chunk[0][1].shape[1]
        B = batch_size
        ids = np.zeros((B, T), np.int32)
        feats = np.zeros((B, T, H), chunk[0][1].dtype)
        target = np.zeros((B, T, H), chunk[0][2].dtype)
        lm = np.zeros((B, T), np.float32)
        pad = np.zeros((B, T), bool)
        for b, (ii, ff, tt, mm) in enumerate(chunk):
            L = min(len(ii), T)
            ids[b, :L] = ii[:L]
            feats[b, :L] = ff[:L]
            target[b, :L] = tt[:L]
            if b < n_real:
                lm[b, :L] = mm[:L]
            pad[b, :L] = True
        yield {
            "input_ids": jnp.asarray(ids),
            "feats": jnp.asarray(feats),
            "target_feats": jnp.asarray(target),
            "loss_mask": jnp.asarray(lm),
            "pad_mask": jnp.asarray(pad),
        }
