"""Mesh + sharding layout — the TPU-native replacement for the reference's
parallelism surface (SURVEY.md §2.4).

The reference scales with accelerate DDP / DeepSpeed ZeRO-2 over NCCL
(/root/reference/eagle/train/main.py:54-55, traineagle3/ds_config.json:32-41)
and has no tensor parallelism at all (only vestigial `pretraining_tp` code,
modeling_llama_kv.py:654-680). Here parallelism is declarative: one
`Mesh(("data", "model"))`, `NamedSharding` on every parameter / cache /
activation, and XLA SPMD inserts the psum/all-gather/reduce-scatter
collectives over ICI.

Layout (Megatron-style TP over the "model" axis):
- attention: q/k/v projections column-sharded on the head axis, o_proj
  row-sharded → one psum per attention block;
- MLP: gate/up column-sharded on the FFN axis, down row-sharded → one psum;
- MoE: experts sharded over "model" (expert parallelism);
- embed/lm_head: vocab-sharded (logits all-gathered by XLA when argmaxed);
- KV cache: kv-heads axis on "model", batch on "data";
- draft head: replicated (it is ~1 layer; replication avoids collectives in
  the latency-critical beam loop).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def make_mesh(n_data: int = 1, n_model: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def target_param_specs(cfg: ModelConfig) -> dict:
    """PartitionSpecs matching models.transformer.init_params structure.

    Layer weights carry a leading stacked-L axis (never sharded).
    """
    layers = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
    }
    if cfg.attn_qkv_bias:
        layers.update(bq=P(None, "model"), bk=P(None, "model"),
                      bv=P(None, "model"))
    if cfg.qk_norm:
        layers.update(q_norm=P(None, None), k_norm=P(None, None))
    if cfg.num_experts > 0:
        layers.update(
            router=P(None, None, None),
            we_gate=P(None, "model", None, None),
            we_up=P(None, "model", None, None),
            we_down=P(None, "model", None, None),
        )
    else:
        layers.update(
            w_gate=P(None, None, "model"),
            w_up=P(None, None, "model"),
            w_down=P(None, "model", None),
        )
    specs = {
        "embed": {"w": P("model", None)},
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, "model")
    return specs


def quantized_target_param_specs(cfg: ModelConfig) -> dict:
    """target_param_specs for an int8-quantized target tree
    (ops/quant.quantize_target_params leaf structure: the seven layer
    projections + lm_head become {"q8": [.., K, N], "scale": [.., N]}).

    q8 inherits the bf16 weight's spec; scale drops the contraction axis.
    TP over int8 is numerically EXACT vs unsharded: a contraction-sharded
    qdense accumulates int32 partials per shard and the psum of exact
    integers is exact, while column-sharded layers need no reduction at
    all — so the sharded engine's greedy output is bit-identical to the
    unsharded int8 engine's (pinned by test_sharding.py).

    MoE expert banks ([L, E, K, N], EP-sharded on E) quantize to
    q8 [L, E, K, N] / scale [L, E, N] — the same drop-the-contraction-axis
    rule; the expert axis keeps its "model" sharding on both leaves.

    For int4 targets use quantized_target_param_specs4."""
    from ..ops.quant import _EXPERT_QUANT_KEYS, _QUANT_KEYS

    specs = target_param_specs(cfg)

    def q(spec: P) -> dict:
        lead = tuple(spec[:-2])
        return {"q8": spec, "scale": P(*lead, spec[-1])}

    layers = dict(specs["layers"])
    for k in _QUANT_KEYS + _EXPERT_QUANT_KEYS:
        if k in layers:
            layers[k] = q(layers[k])
    specs["layers"] = layers
    if "lm_head" in specs:
        specs["lm_head"] = q(specs["lm_head"])
    return specs


def quantized_target_param_specs4(cfg: ModelConfig) -> dict:
    """target_param_specs for an int4-packed target tree
    (ops/quant4.quantize_target_params4 with tp = mesh "model" size).

    Column-parallel weights (model axis on N) keep their spec on q4/scale
    — each shard's N slice is an independent packing, bit-exact. The
    row-parallel weights wo/w_down are packed with a leading BLOCK axis
    ([L, tp, K/(8·tp), N]) and shard THAT over "model": every shard holds
    a standalone half-split packing of a contiguous K range, and the
    kernel's custom_partitioning rule (ops/quant4._get_partitioned) runs
    it locally + one f32 psum — Megatron row-parallel for a Pallas custom
    call XLA SPMD can't split on its own."""
    from ..ops.quant import _QUANT_KEYS
    from ..ops.quant4 import _ROW_PARALLEL_KEYS

    specs = target_param_specs(cfg)

    def q(spec: P, key: str) -> dict:
        lead = tuple(spec[:-2])
        if key in _ROW_PARALLEL_KEYS:
            # [.., K, N] -> q4 [.., blocks, K/(8b), N]; model on blocks
            assert spec[-2] == "model", (key, spec)
            blocked = P(*lead, "model", None, None)
            return {"q4": blocked, "scale": blocked}
        # column-parallel: q4 [.., K/8, N] / scale [.., G, N] keep spec
        return {"q4": spec, "scale": spec}

    layers = dict(specs["layers"])
    for k in _QUANT_KEYS:
        if k in layers:
            layers[k] = q(layers[k], k)
    if "we_gate" in layers:
        # int4 expert-fold leaves (quantize_target_params4): gate/up fold
        # experts into N ([L, H/8, E*F], expert-contiguous -> EP = shard N
        # when E divides the mesh); down folds experts into K and packs
        # blocked ([L, tp, E*F/(8*tp), H], model on the block axis)
        for name in ("we_gate", "we_up", "we_down"):
            layers.pop(name, None)
        colspec = P(None, None, "model")
        layers["we_gate4"] = {"q4": colspec, "scale": colspec}
        layers["we_up4"] = {"q4": colspec, "scale": colspec}
        blocked = P(None, "model", None, None)
        layers["we_down4"] = {"q4": blocked, "scale": blocked}
    specs["layers"] = layers
    if "lm_head" in specs:
        specs["lm_head"] = q(specs["lm_head"], "lm_head")
    return specs


def draft_param_specs(dparams: dict) -> dict:
    """Draft head: fully replicated."""
    return jax.tree.map(lambda x: P(), dparams)


def cache_spec(shard_batch: bool = True) -> P:
    """KVCache k/v: [L, B, n_kv, max_len, head_dim]. Batch is only sharded
    over "data" when it divides (B=1 serving keeps it replicated)."""
    b = "data" if shard_batch else None
    return P(None, b, "model", None, None)


def kv_cache_specs(shard_batch: bool = True, kv_quant: str = "none"):
    from ..ops.kv_cache import KVCache
    b = "data" if shard_batch else None
    # int8-KV scale side arrays [L, B, n_kv, S] shard with their rows
    s = P(None, b, "model", None) if kv_quant == "int8" else None
    return KVCache(k=cache_spec(shard_batch), v=cache_spec(shard_batch),
                   length=P(b), ks=s, vs=s)


def shard_params(params: dict, mesh: Mesh, specs: dict) -> dict:
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def zero_state_specs(tree, mesh: Mesh, axis: str = "data"):
    """ZeRO-style PartitionSpecs for optimizer state (ds_config.json:32-41
    analog): shard every moment tensor over `axis` along its largest
    divisible dimension; scalars/indivisible leaves stay replicated.

    With params replicated and moments sharded, XLA computes each shard's
    slice of the AdamW update locally and all-gathers only the updated
    params — ZeRO-1/2 semantics (sharded state + effectively sharded
    gradient reduction) without any explicit collective code. Memory: a
    1B-param draft head's fp32 AdamW moments drop from ~8 GB replicated to
    ~8/N GB per device."""
    n = mesh.shape[axis]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if not shape:
            return P()
        cands = [i for i in range(len(shape)) if shape[i] % n == 0]
        if not cands:
            return P()
        i = max(cands, key=lambda j: shape[j])
        return P(*[axis if j == i else None for j in range(len(shape))])

    return jax.tree.map(spec_for, tree)


def shard_zero_state(tree, mesh: Mesh, axis: str = "data"):
    """device_put an ALREADY-materialized optax state tree with ZeRO
    sharding over `axis`. Prefer init_sharded_zero_state for fresh init —
    this path first holds the full replicated state in memory."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, zero_state_specs(tree, mesh, axis))


def init_sharded_zero_state(opt, trainable, mesh: Mesh, axis: str = "data"):
    """optax `opt.init` with the state BORN sharded: the state structure is
    derived abstractly (eval_shape), specs computed, and init jitted with
    out_shardings — at no point does the full replicated fp32 state exist
    on any device. This is the ZeRO point: a 1B-param head's ~8 GB AdamW
    moments would otherwise peak replicated at init, OOMing exactly the
    configuration state-sharding exists to enable."""
    shapes = jax.eval_shape(opt.init, trainable)
    specs = zero_state_specs(shapes, mesh, axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda s: isinstance(s, P))
    return jax.jit(opt.init, out_shardings=shardings)(trainable)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
