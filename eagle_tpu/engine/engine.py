"""EagleEngine — the speculative-decoding orchestrator.

TPU-native analog of the reference's EaModel generation loops
(/root/reference/eagle/model/ea_model.py:199-305 `eagenerate`,
eagle/model/utils.py:232-480). One decode round — tree verification,
acceptance, KV compaction, bonus sampling, draft-cache extension and the
next tree's beam expansion — is a single jitted fixed-shape XLA program with
zero host syncs; the host loop only checks the tiny per-round outputs
(accepted tokens) for EOS/length stops.

Also provides the vanilla autoregressive baseline (`naivegenerate`,
ea_model.py:306-382 analog) used for speedup measurement and the greedy
bit-exactness guarantee.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DraftConfig, EngineConfig, ModelConfig
from ..models import draft as draft_mod
from ..models import transformer
from ..ops.kv_cache import (KVCache, compact_accepted, init_cache,
                            merge_rows_window, quantize_kv_rows, slice_rows,
                            with_length)
from ..ops.masks import TreeMaskSpec, prefill_mask
from ..ops.tree import Tree
from . import accept as accept_mod
from .drafter import draft_round
from .sampling import categorical


class EngineState(NamedTuple):
    tokens: jnp.ndarray   # [1, max_len] committed tokens (+ scratch tail)
    length: jnp.ndarray   # scalar int32 committed length
    cache: KVCache        # target KV
    dcache: KVCache       # draft KV (pairs)
    tree: Tree            # next tree to verify
    key: jax.Array
    done: jnp.ndarray     # scalar bool — sequence finished (EOS emitted)
    # sampling temperature as *traced data*: per-request values never force a
    # recompile, and under vmap every batch slot can carry its own. The
    # greedy-vs-sampled program structure is still static (ecfg.temperature
    # == 0 selects the greedy program; this field is ignored there).
    temperature: jnp.ndarray  # scalar fp32


class RoundOutput(NamedTuple):
    new_tokens: jnp.ndarray  # [PATH] committed this round (first n_acc valid)
    accept_len: jnp.ndarray  # scalar int32 (-1 when the sequence is done)
    done: jnp.ndarray        # scalar bool
    live_match: jnp.ndarray = jnp.int32(0)  # forced replay: live-argmax
                             # agreements with the reference this round


def _target_feats(res: transformer.ForwardResult, version: int) -> jnp.ndarray:
    """Draft input features: v3 = fused 3-tap (utils.py:248-252), v1 = the
    post-final-norm hidden (ea_model.py:172-196 output)."""
    return res.taps if version == 3 else res.hidden


class EagleEngine:
    """Owns params + configs and the compiled per-round programs."""

    def __init__(self, params: dict, cfg: ModelConfig, dparams: dict,
                 dcfg: DraftConfig, ecfg: EngineConfig,
                 eos_token_id: Optional[int] = None,
                 sp_mesh=None, sp_axis: str = "data"):
        self.params, self.cfg = params, cfg
        self.eos_token_id = eos_token_id  # device-side finish detection
        # optional sequence-parallel prefill (ring attention over sp_axis)
        self.sp_mesh, self.sp_axis = sp_mesh, sp_axis
        if ecfg.fuse_draft:
            # concat q|k|v and gate|up before (possible) quantization: the
            # beam loop then streams one tensor / one dispatch per group
            dparams = draft_mod.fuse_projections(dparams)
        if ecfg.draft_quant == "int8":
            from ..ops.quant import quantize_draft_params
            dparams = quantize_draft_params(dparams)
        elif ecfg.draft_quant == "int4":
            from ..ops.quant4 import quantize_draft_params4
            dparams = quantize_draft_params4(dparams,
                                             group=ecfg.draft_quant_group)
        elif ecfg.draft_quant != "none":
            # a typo here would silently benchmark/serve the bf16 draft
            # while reporting a quantized operating point
            raise ValueError(f"unknown draft_quant {ecfg.draft_quant!r} "
                             f"(expected 'none' | 'int8' | 'int4')")
        if ecfg.kv_quant not in ("none", "int8"):
            raise ValueError(f"unknown kv_quant {ecfg.kv_quant!r} "
                             f"(expected 'none' | 'int8')")
        if ecfg.acceptance not in ("q1", "true_q", "true_q_dynamic"):
            raise ValueError(
                f"unknown acceptance {ecfg.acceptance!r} "
                "(expected 'q1' | 'true_q' | 'true_q_dynamic')")
        self.dparams, self.dcfg = dparams, dcfg
        self.ecfg = ecfg
        if ecfg.tree_paths is not None:
            from .drafter import StaticTreeSpec
            self.static_spec = StaticTreeSpec(ecfg.tree_paths)
            self.path_len = self.static_spec.max_depth + 2
        else:
            self.static_spec = None
            self.path_len = ecfg.depth + 2
        # rows that must remain free past the committed context for one
        # round: the commit window, plus the Pallas compaction kernel's
        # 8-row staging/alignment margin (pallas_attn.py:compact_rows)
        self._tail = (max(self.path_len + 1, 16)
                      if ecfg.compact_impl == "pallas"
                      else self.path_len + 1)
        # v1 drafting scores use the target's lm_head (cnets1.py:702,732)
        if dcfg.version == 1:
            self._lm_head_w = (params["embed"]["w"].T if cfg.tie_embeddings
                               else params["lm_head"])
        else:
            self._lm_head_w = None
        self._prefill_jit = {}
        self._extend_jit = {}  # extend-window bucket -> jitted _extend
        self._round_jit = jax.jit(self._round, donate_argnums=(2,))
        self._round_jit_batched = None
        self._vanilla_prefill_jit = {}
        self._vanilla_step_jit = jax.jit(self._vanilla_step, donate_argnums=(1,))
        self._vanilla_scan_jit = {}

    @classmethod
    def from_pretrained(cls, base_model_path: str, ea_model_path: str,
                        use_eagle3: bool = False, total_tokens: int = 60,
                        depth: int = 5, top_k: int = 10, max_len: int = 2048,
                        temperature: float = 0.0,
                        eos_token_id: Optional[int] = None,
                        dtype=jnp.bfloat16,
                        target_quant: Optional[str] = None,
                        draft_quant: Optional[str] = None,
                        kv_quant: Optional[str] = None,
                        quant_group: int = 128,
                        mesh=None) -> "EagleEngine":
        """Load target + draft checkpoints and build an engine — the
        ea_model.py:89-170 `EaModel.from_pretrained` analog (total_tokens=-1
        auto-tuning is available separately via `calibrate_total_tokens`).

        target_quant: None | "int8" | "int4" — weight-only target
        quantization on load (a serving operating point: outputs are
        bit-exact vs the quantized target's own vanilla decode; the int4
        path runs the stacked Pallas w4a8 kernel on TPU). draft_quant:
        same choices for the draft head — LOSSLESS (acceptance only
        commits target-verified tokens). kv_quant: None | "int8" — int8
        KV cache storage (EngineConfig.kv_quant; halves decode-round KV
        streaming, its own greedy==vanilla operating point).
        quant_group: int4 scale-group size along K (default 128, the
        GPTQ/AWQ-standard point; 512 is the measured faster-but-coarser
        opt-in — fewer per-group scale passes in the w4a8 kernel, ~8%
        quicker matmuls per the ops/quant4.py ablation, at coarser
        quantization granularity). When `mesh` is given, target params
        are tensor-parallel sharded and the draft head replicated
        (parallel/sharding.py layout; quantized trees use the matching
        quantized spec functions)."""
        from ..models.hf_loader import load_draft, load_target

        params, cfg = load_target(base_model_path, dtype=dtype)
        dparams, dcfg = load_draft(ea_model_path,
                                   version=3 if use_eagle3 else 1,
                                   dtype=dtype,
                                   target_embed=params["embed"]["w"])
        tp = (1 if mesh is None
              else int(np.prod([s for a, s in zip(mesh.axis_names,
                                                  mesh.devices.shape)
                                if a == "model"])))
        if target_quant == "int8":
            from ..ops.quant import quantize_target_params
            params = quantize_target_params(params)
        elif target_quant == "int4":
            from ..ops.quant4 import quantize_target_params4
            params = quantize_target_params4(params, group=quant_group,
                                             tp=tp)
        if total_tokens == -1:
            total_tokens = calibrate_total_tokens(
                params, cfg, max_len=max_len,
                kv_quant=kv_quant or "none")
        ecfg = EngineConfig(total_tokens=total_tokens, depth=depth,
                            top_k=top_k, max_len=max_len,
                            temperature=temperature,
                            draft_quant=draft_quant or "none",
                            kv_quant=kv_quant or "none")
        if mesh is not None:
            from ..parallel import sharding as shd
            specs = (shd.quantized_target_param_specs(cfg)
                     if target_quant == "int8"
                     else shd.quantized_target_param_specs4(cfg)
                     if target_quant == "int4"
                     else shd.target_param_specs(cfg))
            params = shd.shard_params(params, mesh, specs)
            dparams = shd.replicate(dparams, mesh)
        return cls(params, cfg, dparams, dcfg, ecfg,
                   eos_token_id=eos_token_id)

    # ------------------------------------------------------------------
    # cache allocation
    # ------------------------------------------------------------------

    def _draft_round(self, dparams, ext_tokens, ext_feats, n_new, dcache,
                     key=None, temperature=None):
        if self.static_spec is not None:
            from .drafter import draft_round_static
            return draft_round_static(dparams, self.dcfg, self.static_spec,
                                      ext_tokens, ext_feats, n_new, dcache,
                                      self._lm_head_w, ecfg=self.ecfg,
                                      key=key, temperature=temperature)
        return draft_round(dparams, self.dcfg, self.ecfg, ext_tokens,
                           ext_feats, n_new, dcache, self._lm_head_w,
                           key=key, temperature=temperature)

    def _sibling(self, **ecfg_changes) -> "EagleEngine":
        """New engine sharing all params/caches-of-origin with an EngineConfig
        delta. dparams are already quantized by our own __init__ — the
        sibling must not re-quantize them."""
        ecfg = dataclasses.replace(self.ecfg, draft_quant="none",
                                   **ecfg_changes)
        return EagleEngine(self.params, self.cfg, self.dparams, self.dcfg,
                           ecfg, eos_token_id=self.eos_token_id,
                           sp_mesh=self.sp_mesh, sp_axis=self.sp_axis)

    def with_sampling(self, sampled: bool) -> "EagleEngine":
        """Sibling engine sharing all params, with the greedy (sampled=False)
        or sampled (sampled=True) program structure. Used to honor
        per-request temperature: t>0 values are traced data on a sampled
        engine; t=0 needs the structurally different greedy program."""
        if (self.ecfg.temperature > 0) == bool(sampled):
            return self
        return self._sibling(temperature=(1.0 if sampled else 0.0))

    def with_tree(self, total_tokens: Optional[int] = None,
                  depth: Optional[int] = None,
                  top_k: Optional[int] = None) -> "EagleEngine":
        """Sibling engine sharing all params at a different speculation-tree
        operating point. Batched serving is verify-compute-bound (B·n tree
        tokens through the target per round), so it wants a smaller tree
        than the B=1 latency point — `calibrate_total_tokens(batch=N)` is
        the tuner. Greedy output is invariant to tree size (always equals
        `generate_vanilla`), so swapping trees changes throughput only."""
        changes = {k: v for k, v in dict(total_tokens=total_tokens,
                                         depth=depth, top_k=top_k).items()
                   if v is not None}
        if not changes:
            return self
        if self.static_spec is not None:
            raise ValueError(
                "with_tree tunes dynamic trees; static topologies are fixed "
                "by EngineConfig.tree_paths — build a new engine instead")
        return self._sibling(**changes)

    def _bucket(self, n: int) -> int:
        """Prompt padding bucket. The QUANTUM is capped by max_len (a
        128-token quantum would overflow the preallocated caches of
        small-max_len engines); the result is NOT capped — callers must
        ensure n fits max_len (generate/stream/servers all guard on
        n + path_len + 1 < max_len before bucketing)."""
        return _bucket(n, quantum=min(128, self.ecfg.max_len))

    def _tgt_len(self) -> int:
        """KV rows for the target cache: max_len + tree scratch (+ the
        Pallas compaction staging margin), rounded up so the Pallas
        attention kernel's KV-block grid divides evenly (the kernel adapts
        its block size down to 128)."""
        e = self.ecfg
        margin = 16 if e.compact_impl == "pallas" else 0
        return -(-(e.max_len + e.tree_size + margin) // 128) * 128

    def init_target_cache(self, rows: Optional[int] = None) -> KVCache:
        """Dense target KV (default full-size; `rows` for paged-mode prompt
        scratch that only needs to hold the prefill before page scatter)."""
        c = self.cfg
        return init_cache(c.num_layers, 1, c.num_kv_heads,
                          rows if rows is not None else self._tgt_len(),
                          c.head_dim, dtype=c.dtype,
                          kv_quant=self.ecfg.kv_quant)

    def init_draft_cache(self) -> KVCache:
        e, d = self.ecfg, self.dcfg
        # draft scratch: beam rows (dynamic; sampled two-pass mode also
        # rewrites tree_size rows in place) or tree rows (static) +
        # extension-window padding
        scratch = (e.tree_size if self.static_spec is not None
                   else max((e.depth + 1) * e.top_k, e.tree_size))
        dft_len = e.max_len + scratch + self.path_len
        return init_cache(d.num_layers if d.version == 1 else 1, 1,
                          d.num_kv_heads, dft_len, d.head_dim, dtype=d.dtype)

    def init_caches(self) -> tuple[KVCache, KVCache]:
        return self.init_target_cache(), self.init_draft_cache()

    # ------------------------------------------------------------------
    # speculative path
    # ------------------------------------------------------------------

    def _prefill(self, params, dparams, tokens, prompt_len, cache, dcache,
                 key, temperature=None, ref=None):
        """Prompt prefill + first draft tree (utils.py:232-255 analog).

        tokens: [1, Tp] padded; prompt_len: scalar int32 ≤ Tp. With
        `sp_mesh` configured, the prompt forward runs sequence-parallel
        (ring attention over the mesh axis — parallel/ring_attention.py) and
        the produced K/V are written into the decode cache, resharded to its
        head-parallel layout by XLA. `temperature` (traced scalar, optional)
        overrides ecfg.temperature for this request; it rides in the state.
        """
        if temperature is None:
            temperature = jnp.float32(self.ecfg.temperature)
        Tp = tokens.shape[1]
        S = cache.max_len
        # sliding-window targets must take the standard prefill: ring
        # attention is pure-causal and would silently change attention
        # extents vs the decode path (ADVICE r1)
        if (self.sp_mesh is not None and self.cfg.num_experts == 0
                and self.cfg.sliding_window is None
                and Tp % self.sp_mesh.shape[self.sp_axis] == 0):
            from ..parallel.ring_attention import prefill_sp

            hidden, taps, k_sp, v_sp = prefill_sp(params, self.cfg, tokens,
                                                  self.sp_mesh,
                                                  axis=self.sp_axis)
            new_ks = new_vs = None
            if cache.ks is not None:
                # quantize the ring-attention K/V rows ([L,B,nkv,Tp,d]:
                # absmax over d) on their way into the int8 cache
                k_sp, sk = quantize_kv_rows(k_sp)
                v_sp, sv = quantize_kv_rows(v_sp)
                new_ks = jax.lax.dynamic_update_slice(cache.ks, sk,
                                                      (0, 0, 0, 0))
                new_vs = jax.lax.dynamic_update_slice(cache.vs, sv,
                                                      (0, 0, 0, 0))
            new_k = jax.lax.dynamic_update_slice(
                cache.k, k_sp.astype(cache.k.dtype), (0, 0, 0, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                cache.v, v_sp.astype(cache.v.dtype), (0, 0, 0, 0, 0))
            res = transformer.ForwardResult(
                hidden=hidden, pre_norm_hidden=hidden, taps=taps,
                cache=KVCache(k=new_k, v=new_v, length=cache.length + Tp,
                              ks=new_ks, vs=new_vs))
        else:
            pos = jnp.arange(Tp, dtype=jnp.int32)[None]
            mask = prefill_mask(Tp, S, cache.length)
            res = transformer.forward(params, self.cfg, tokens, cache, pos,
                                      mask)
        last_logits = transformer.lm_head(
            params, self.cfg, res.hidden[0, prompt_len - 1])      # [V] fp32
        key, k1, k_draft = jax.random.split(key, 3)
        root = self._pick_token(last_logits, k1, temperature)
        if ref is not None:  # forced replay: the first token is pinned too
            root = ref[prompt_len]
        cache = with_length(res.cache, prompt_len[None])

        feats = _target_feats(res, self.dcfg.version)[0]           # [Tp, F]
        ext_tokens = jnp.concatenate(
            [tokens[0, 1:], jnp.zeros((1,), jnp.int32)]
        ).at[prompt_len - 1].set(root)
        dr = self._draft_round(dparams, ext_tokens, feats, prompt_len, dcache,
                               key=k_draft, temperature=temperature)
        tokens_buf = jnp.zeros((1, S), jnp.int32)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, tokens, (0, 0))
        return EngineState(tokens=tokens_buf, length=prompt_len, cache=cache,
                           dcache=dr.dcache, tree=dr.tree, key=key,
                           done=jnp.bool_(False), temperature=temperature)

    def _extend(self, params, dparams, tokens, n_new, start, state, key,
                temperature=None):
        """Incremental prefill: append context tokens to a committed state
        (multi-turn KV reuse — the reference re-prefills the whole history
        every turn, ea_model.py:199-241 resets all caches per call).

        tokens: [1, Te] padded window whose row 0 is the ALREADY-COMMITTED
            token at position `start` (= resume point − 1) and rows
            1..n_new−1 are the appended context. Re-running the boundary row
            reproduces its target features — needed because its draft pair's
            input token was the previous turn's uncommitted bonus, not the
            new context's first token — and rewrites its target-KV row with
            bit-identical values (same token, same positions, same causal
            extent as the original forward).
        n_new: scalar int32 valid rows (1 + appended tokens).
        start: scalar int32 resume position; may be < state.length (rewind:
            host-side EOS/budget trimming or an edited history — stale rows
            past `start` are overwritten or masked by length).
        Returns a fresh EngineState (length = start + n_new) whose next
        `_round` continues bit-identically to a from-scratch prefill of the
        full context (greedy), cf. tests/test_session.py.
        """
        if temperature is None:
            temperature = jnp.float32(self.ecfg.temperature)
        Te = tokens.shape[1]
        S = state.cache.max_len
        cache = with_length(state.cache, start[None])
        pos = (start + jnp.arange(Te, dtype=jnp.int32))[None]
        mask = prefill_mask(Te, S, cache.length)
        res = transformer.forward(params, self.cfg, tokens, cache, pos, mask)
        last_logits = transformer.lm_head(
            params, self.cfg, res.hidden[0, n_new - 1])            # [V] fp32
        key, k1, k_draft = jax.random.split(key, 3)
        root = self._pick_token(last_logits, k1, temperature)
        new_len = start + n_new
        cache = with_length(res.cache, new_len[None])

        feats = _target_feats(res, self.dcfg.version)[0]           # [Te, F]
        ext_tokens = jnp.concatenate(
            [tokens[0, 1:], jnp.zeros((1,), jnp.int32)]
        ).at[n_new - 1].set(root)
        dcache = with_length(state.dcache, start[None])
        dr = self._draft_round(dparams, ext_tokens, feats, n_new, dcache,
                               key=k_draft, temperature=temperature)
        tokens_buf = jax.lax.dynamic_update_slice(state.tokens, tokens,
                                                  (0, start))
        return EngineState(tokens=tokens_buf, length=new_len, cache=cache,
                           dcache=dr.dcache, tree=dr.tree, key=key,
                           done=jnp.bool_(False), temperature=temperature)

    def _pick_token(self, logits: jnp.ndarray, key: jax.Array,
                    temperature=None) -> jnp.ndarray:
        e = self.ecfg
        if e.temperature == 0.0:
            return jnp.argmax(logits).astype(jnp.int32)
        from .sampling import process_logits
        t = (jnp.float32(e.temperature) if temperature is None
             else jnp.maximum(temperature, 1e-4))
        p = jax.nn.softmax(process_logits(logits, t, e.sampling_top_k,
                                          e.top_p))
        return categorical(key, p)

    def _round(self, params, dparams, state: EngineState,
               kv_limit: Optional[int] = None, batched: bool = False,
               ref: Optional[jnp.ndarray] = None):
        """One speculative decode round (ea_model.py:251-299 analog).

        kv_limit (static): run the round against only the first `kv_limit`
        KV rows — valid whenever committed length + tree + commit window fit
        inside it. Length-bucketed decoding (EngineConfig.kv_buckets) uses
        this so attention reads scale with the live context, not the
        preallocated cache. `batched` (static): set by vmapped callers —
        disables the B=1-only Pallas compaction kernel.

        ref (traced, optional): forced-replay reference — a full-cache-sized
        [S] int32 token buffer. When given (greedy engines only), acceptance
        and the bonus token are pinned to `ref` instead of the live argmax
        (accept.accept_greedy ref_next semantics); the committed trajectory
        is exactly ref, while every timed component (draft beam, verify
        forward, compaction) is unchanged. The teacher-forced rollout
        measurement mode (reference getkacc, train/main.py:240-293, lifted
        to the engine level).
        """
        if kv_limit is not None and kv_limit < state.cache.max_len:
            small = state._replace(cache=slice_rows(state.cache, kv_limit))
            new_small, out = self._round(params, dparams, small,
                                         batched=batched, ref=ref)
            # a round only modifies rows [Lc, Lc + tree_size + tail): the
            # verify writes the tree there, compaction rearranges within
            # it (+ the Pallas staging margin) — write back just that
            # window, not the whole bucket (profiled at ~0.15 ms/step of
            # pure copies at bucket 256; the capacity stop guarantees the
            # window fits below every bucket boundary)
            merged = merge_rows_window(state.cache, new_small.cache,
                                       state.cache.length,
                                       self.ecfg.tree_size + self._tail)
            return new_small._replace(cache=merged), out
        e, tree = self.ecfg, state.tree
        S = state.cache.max_len
        Lc = state.length

        # --- target tree verification (utils.py:306-335); the mask goes in
        # as metadata — the model expands it (XLA) or feeds the Pallas
        # kernel (cfg.attn_impl == "pallas_tree")
        vmask = TreeMaskSpec(tree_mask=tree.mask[None],
                             start=state.cache.length)
        pos = (Lc + tree.positions)[None]
        res = transformer.forward(params, self.cfg, tree.tokens[None],
                                  state.cache, pos, vmask)
        logits = transformer.lm_head(params, self.cfg, res.hidden[0])  # [N,V]
        feats = _target_feats(res, self.dcfg.version)[0]               # [N,F]

        # --- acceptance (utils.py:337-416)
        key, k_acc, k_bonus, k_draft = jax.random.split(state.key, 4)
        temp = jnp.maximum(state.temperature, 1e-4)
        if e.temperature == 0.0:
            if ref is not None:
                ref_next = jax.lax.dynamic_slice(ref, (Lc + 1,),
                                                 (self.path_len,))
                acc = accept_mod.accept_greedy(tree, logits, self.path_len,
                                               ref_next=ref_next)
                bonus = ref_next[acc.accept_len]
            else:
                acc = accept_mod.accept_greedy(tree, logits, self.path_len)
                bonus = jnp.argmax(acc.sample_p).astype(jnp.int32)
        elif tree.node_probs is not None:
            # sampled candidates → true-q rule (modeling_eagle.py:1398-1459)
            acc = accept_mod.accept_sampled_true_q(tree, logits, k_acc, e,
                                                   self.path_len,
                                                   temperature=temp)
            bonus = categorical(k_bonus, acc.sample_p)
        else:
            acc = accept_mod.accept_sampled(tree, logits, k_acc, e,
                                            self.path_len, temperature=temp)
            bonus = categorical(k_bonus, acc.sample_p)

        # --- commit tokens + compact KV (utils.py:419-452)
        # finished sequences commit nothing (batched per-sequence finish,
        # the modeling_eagle.py:1463-1552 ragged-accept semantics)
        path_tokens = tree.tokens[acc.path]                         # [PATH]
        n_acc = jnp.where(state.done, 0, acc.accept_len + 1)
        tokens_buf = jax.lax.dynamic_update_slice(
            state.tokens, path_tokens[None], (0, Lc))
        use_pallas_compact = (
            e.compact_impl == "pallas" and not batched
            and e.kv_quant == "none"  # kernel moves raw bf16 rows only
            and (jax.default_backend() != "tpu"
                 or self.cfg.head_dim % 128 == 0))
        if use_pallas_compact:
            from ..ops.pallas_attn import compact_rows
            ck, cv = compact_rows(res.cache.k, res.cache.v, acc.path, Lc,
                                  tree_size=e.tree_size,
                                  interpret=jax.default_backend() != "tpu")
            cache = KVCache(k=ck, v=cv, length=(Lc + n_acc)[None])
        else:
            cache = compact_accepted(with_length(res.cache, Lc[None]),
                                     acc.path[None], n_acc[None])
        done = state.done
        if self.eos_token_id is not None:
            in_window = jnp.arange(self.path_len) < n_acc
            done = done | jnp.any(
                (path_tokens == self.eos_token_id) & in_window)
        # capacity stop: no room for another round's tree + commit window
        # (+ compaction staging margin; against the FULL cache size — S may
        # be a kv_limit slice)
        done = done | (Lc + n_acc + self._tail + e.tree_size
                       >= self._tgt_len())

        # --- next draft tree (utils.py:459-468)
        ext_tokens = jnp.concatenate(
            [path_tokens[1:], jnp.zeros((1,), jnp.int32)]
        ).at[acc.accept_len].set(bonus)
        ext_feats = feats[acc.path]                                 # [PATH, F]
        dr = self._draft_round(dparams, ext_tokens, ext_feats, n_acc,
                               state.dcache, key=k_draft,
                               temperature=state.temperature)

        new_state = EngineState(tokens=tokens_buf, length=Lc + n_acc,
                                cache=cache, dcache=dr.dcache, tree=dr.tree,
                                key=key, done=done,
                                temperature=state.temperature)
        return new_state, RoundOutput(new_tokens=path_tokens,
                                      accept_len=n_acc - 1, done=done,
                                      live_match=acc.live_match)

    def _temp(self, temperature: Optional[float]) -> jnp.ndarray:
        """Effective request temperature as a traced fp32 scalar."""
        return jnp.float32(self.ecfg.temperature if temperature is None
                           else temperature)

    def generate(self, prompt_ids, max_new_tokens: int = 512,
                 eos_token_id: Optional[int] = None, seed: int = 0,
                 log: bool = False, details: bool = False,
                 temperature: Optional[float] = None):
        """Speculative generation (eagenerate analog). Returns np token ids
        (prompt + completion); with log=True also (new_tokens, rounds); with
        details=True returns (ids, stats-dict incl. per-round accept_lens)."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(1, -1)
        Lp = prompt.shape[1]
        Tp = self._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = prompt
        cache, dcache = self.init_caches()
        key = jax.random.PRNGKey(seed)

        prefill = self._prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(self._prefill, donate_argnums=(4, 5))
            self._prefill_jit[Tp] = prefill
        state = prefill(self.params, self.dparams, jnp.asarray(padded),
                        jnp.int32(Lp), cache, dcache, key,
                        self._temp(temperature))

        out = list(prompt[0])
        rounds = 0
        new_tokens = 0
        accept_lens = []
        while new_tokens < max_new_tokens:
            state, r = self._round_jit(self.params, self.dparams, state)
            alen = int(r.accept_len)
            if alen < 0:  # device-side finish flag tripped
                break
            toks = np.asarray(r.new_tokens[: alen + 1])
            rounds += 1
            accept_lens.append(alen)
            stop = False
            for t in toks:
                out.append(int(t))
                new_tokens += 1
                if (eos_token_id is not None and t == eos_token_id) or \
                        new_tokens >= max_new_tokens:
                    stop = True
                    break
            if stop or len(out) + self.path_len + 1 >= self.ecfg.max_len:
                break
        if details:
            return np.asarray(out), {
                "new_tokens": new_tokens, "rounds": rounds,
                "accept_lens": accept_lens,
            }
        if log:
            return np.asarray(out), new_tokens, rounds
        return np.asarray(out)

    # ------------------------------------------------------------------
    # fully device-side generation: ONE dispatch per request
    # ------------------------------------------------------------------

    def _rounds_loop(self, params, dparams, state: EngineState,
                     budget: jnp.ndarray, ref=None):
        """lax.while_loop over decode rounds — zero host round-trips.

        This is the TPU-native shape of the decode loop (SURVEY.md §7 design
        stance): the reference syncs with the host every round and every
        accepted token (utils.py:375-415); here EOS and budget checks are
        on-device `done` logic, so an entire generation is one XLA program.

        With `ref` (forced replay, see _round), also accumulates the count
        of live-argmax agreements with the reference across rounds.
        """
        L0 = state.length

        def cond(carry):
            st, rounds, hits = carry
            return (~st.done) & (st.length - L0 < budget)

        buckets = self._kv_buckets()

        def body(carry):
            st, rounds, hits = carry
            if buckets is None:
                st, out = self._round(params, dparams, st, ref=ref)
            else:
                idx = self._bucket_index(st.length, buckets)
                st, out = jax.lax.switch(
                    idx,
                    [(lambda s, b=b: self._round(params, dparams, s,
                                                 kv_limit=b, ref=ref))
                     for b in buckets],
                    st)
            return (st, rounds + 1, hits + out.live_match)

        state, rounds, hits = jax.lax.while_loop(
            cond, body, (state, jnp.int32(0), jnp.int32(0)))
        return state, rounds, hits

    def _kv_buckets(self):
        """Ascending KV-row buckets ending at the full cache size."""
        if not self.ecfg.kv_buckets:
            return None
        full = self._tgt_len()
        bs = sorted(b for b in self.ecfg.kv_buckets if b < full)
        return tuple(bs) + (full,)

    def _bucket_index(self, length, buckets):
        """Smallest bucket holding the committed context + one round's tree
        and commit window. The same formula gates the vanilla scan so both
        paths see identical attention extents at identical lengths (greedy
        bit-exactness is preserved under bucketing)."""
        need = length + self.ecfg.tree_size + self._tail
        idx = jnp.int32(0)
        for b in buckets[:-1]:
            idx = idx + (need > b).astype(jnp.int32)
        return idx

    def _trim_overshoot(self, seq: np.ndarray, prompt_len: int,
                        max_new_tokens: int) -> np.ndarray:
        """Trim a fused generation's overshoot (up to one commit window)
        host-side, stopping at the first EOS if one is configured."""
        limit = prompt_len + max_new_tokens
        if self.eos_token_id is not None:
            hits = np.nonzero(seq[prompt_len:] == self.eos_token_id)[0]
            if hits.size:
                limit = min(limit, prompt_len + int(hits[0]) + 1)
        return seq[:limit]

    def _make_ref_buf(self, ft, prompt_row, max_new_tokens: int,
                      label: str = "force_tokens") -> np.ndarray:
        """Validate one forced-replay reference and zero-pad it to the full
        cache length. The `need` formula bounds the deepest `ref_next` read
        `_round` can issue (prompt + budget + one round's commit window)."""
        if self.ecfg.temperature != 0.0:
            raise ValueError(f"{label} requires a greedy engine")
        ft = np.asarray(ft, np.int32).ravel()
        Lp = len(prompt_row)
        if not np.array_equal(ft[:Lp], np.asarray(prompt_row, np.int32)):
            raise ValueError(f"{label} must start with the prompt")
        need = Lp + max_new_tokens + self.path_len + 1
        if ft.size < need:
            raise ValueError(
                f"{label} too short: {ft.size} < {need} "
                "(prompt + budget + one round's commit window)")
        buf = np.zeros((self._tgt_len(),), np.int32)
        n = min(ft.size, buf.size)
        buf[:n] = ft[:n]
        return buf

    def generate_fused(self, prompt_ids, max_new_tokens: int = 512,
                       seed: int = 0, log: bool = False,
                       temperature: Optional[float] = None,
                       force_tokens=None):
        """Speculative generation with prefill + all rounds in two device
        dispatches total. EOS stop requires the engine to be constructed
        with `eos_token_id`. May overshoot max_new_tokens by up to one
        round's window (trimmed host-side, EOS-respecting).

        force_tokens (greedy engines only): a 1-D int token sequence whose
        first len(prompt_ids) entries are the prompt — forced-replay mode.
        The engine walks exactly this trajectory (acceptance/bonus pinned to
        it, see _round); τ then measures the draft's acceptance on a FIXED
        reference continuation, the engine-level getkacc. With log=True
        returns (ids, new_tokens, rounds, live_match) — live_match counting
        how often the live target argmax agreed with the reference.
        """
        prompt = np.asarray(prompt_ids, np.int32).reshape(1, -1)
        Lp = prompt.shape[1]
        Tp = self._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = prompt
        cache, dcache = self.init_caches()
        key = jax.random.PRNGKey(seed)
        forced = force_tokens is not None
        if forced:
            ref_buf = self._make_ref_buf(force_tokens, prompt[0],
                                         max_new_tokens)
        kf = ("fused", Tp, forced)
        fn = self._prefill_jit.get(kf)
        if fn is None:
            def prefill_and_rounds(params, dparams, toks, plen, cache,
                                   dcache, key, budget, temp, ref=None):
                st = self._prefill(params, dparams, toks, plen, cache,
                                   dcache, key, temp, ref=ref)
                st, rounds, hits = self._rounds_loop(params, dparams, st,
                                                     budget, ref=ref)
                return st.tokens, st.length, rounds, hits
            if forced:
                fn = jax.jit(prefill_and_rounds, donate_argnums=(4, 5))
            else:
                fn = jax.jit(
                    functools.partial(prefill_and_rounds, ref=None),
                    donate_argnums=(4, 5))
            self._prefill_jit[kf] = fn
        args = (self.params, self.dparams, jnp.asarray(padded),
                jnp.int32(Lp), cache, dcache, key,
                jnp.int32(max_new_tokens), self._temp(temperature))
        if forced:
            toks, length, rounds, hits = fn(*args, jnp.asarray(ref_buf))
        else:
            toks, length, rounds, hits = fn(*args)
        out = self._trim_overshoot(np.asarray(toks[0, : int(length)]), Lp,
                                   max_new_tokens)
        # log mode reports tokens the engine actually COMMITTED (untrimmed):
        # τ = committed/rounds; the budget-trimmed count would quantize τ by
        # up to one commit window per measurement (and can bias a Δn/Δrounds
        # slope past path_len when the final round's overshoot is cut)
        if log and forced:
            return out, int(length) - Lp, int(rounds), int(hits)
        if log:
            return out, int(length) - Lp, int(rounds)
        return out

    def generate_batch_fused(self, prompts, max_new_tokens: int = 512,
                             seed: int = 0,
                             temperature: Optional[float] = None,
                             force_tokens=None, log: bool = False):
        """Batched + fused: the whole batch's decode is ONE device dispatch
        (vmapped rounds inside lax.while_loop, per-sequence done/budget
        flags). The serving configuration: weight streaming is amortized
        across the batch while every sequence still speculates.

        force_tokens (greedy engines only): per-sequence reference token
        sequences, each starting with its prompt — the batched analog of
        generate_fused's forced-replay mode. Every sequence replays its own
        trajectory while all timed components run unchanged.

        log=True returns (outs, committed, rounds): per-sequence committed
        token counts (untrimmed) and the number of batch decode rounds."""
        B = len(prompts)
        lens = [len(p) for p in prompts]
        Tp = self._bucket(max(lens))
        padded = np.zeros((B, 1, Tp), np.int32)
        for i, p in enumerate(prompts):
            padded[i, 0, : lens[i]] = np.asarray(p, np.int32)
        plens = jnp.asarray(lens, jnp.int32)
        cache, dcache = self.init_caches()
        caches = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), (cache, dcache))
        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        forced = force_tokens is not None
        if forced:
            if len(force_tokens) != B:
                raise ValueError("need one force_tokens row per prompt")
            refs = np.stack([
                self._make_ref_buf(ft, padded[i, 0, : lens[i]],
                                   max_new_tokens, label=f"force_tokens[{i}]")
                for i, ft in enumerate(force_tokens)])

        kf = ("batch_fused", B, Tp, forced)
        fn = self._prefill_jit.get(kf)
        if fn is None:
            def run(params, dparams, toks, plens, cache, dcache, keys,
                    budget, temp, refs=None):
                pf_axes = (None, None, 0, 0, 0, 0, 0, None)
                pf_args = (params, dparams, toks, plens, cache, dcache, keys,
                           temp)
                if refs is not None:
                    pf_axes += (0,)
                    pf_args += (refs,)
                state = jax.vmap(self._prefill, in_axes=pf_axes)(*pf_args)
                L0 = state.length
                buckets = self._kv_buckets()

                def cond(st):
                    return jnp.any(~st.done)

                def round_b(st, kv_limit=None):
                    st, _ = jax.vmap(
                        lambda p, dp, s, r: self._round(p, dp, s,
                                                        kv_limit=kv_limit,
                                                        batched=True, ref=r),
                        in_axes=(None, None, 0,
                                 None if refs is None else 0)
                    )(params, dparams, st, refs)
                    return st

                def body(carry):
                    st, rounds = carry
                    if buckets is None:
                        st = round_b(st)
                    else:
                        # one bucket for the whole batch: the max live
                        # context decides (switch sits OUTSIDE the vmap so
                        # only one branch's reads happen per round)
                        idx = self._bucket_index(jnp.max(st.length), buckets)
                        st = jax.lax.switch(
                            idx,
                            [(lambda s, b=b: round_b(s, kv_limit=b))
                             for b in buckets],
                            st)
                    st = st._replace(
                        done=st.done | (st.length - L0 >= budget))
                    return st, rounds + 1

                state, rounds = jax.lax.while_loop(
                    lambda c: cond(c[0]), body, (state, jnp.int32(0)))
                return state.tokens, state.length, rounds

            if forced:
                fn = jax.jit(run, donate_argnums=(4, 5))
            else:
                fn = jax.jit(functools.partial(run, refs=None),
                             donate_argnums=(4, 5))
            self._prefill_jit[kf] = fn
        args = (self.params, self.dparams, jnp.asarray(padded),
                plens, caches[0], caches[1], keys,
                jnp.int32(max_new_tokens), self._temp(temperature))
        if forced:
            toks, lengths, rounds = fn(*args, jnp.asarray(refs))
        else:
            toks, lengths, rounds = fn(*args)
        toks = np.asarray(toks)
        lengths = np.asarray(lengths)
        outs = [self._trim_overshoot(toks[i, 0, : lengths[i]], lens[i],
                                     max_new_tokens)
                for i in range(B)]
        if log:
            committed = [int(lengths[i]) - lens[i] for i in range(B)]
            return outs, committed, int(rounds)
        return outs

    # ------------------------------------------------------------------
    # batched speculative generation (modeling_eagle.py EAGLE bs>1 analog)
    # ------------------------------------------------------------------

    def generate_batch(self, prompts, max_new_tokens: int = 512,
                       seed: int = 0, temperature: Optional[float] = None):
        """Batched speculative generation with per-sequence finish flags —
        the behavioral equivalent of the reference's standalone batched path
        (modeling_eagle.py:1555-1736 `EAGLE.generate`): every sequence keeps
        its own ragged accept lengths / KV lengths; finished sequences stop
        committing. Implemented as `vmap` of the single-sequence round
        program (topology stays data, shapes stay fixed).

        prompts: list of 1-D int token arrays. Requires the engine to be
        constructed with `eos_token_id` for early finish (else all sequences
        run the full budget). Returns a list of np arrays (prompt + completion).
        """
        B = len(prompts)
        lens = [len(p) for p in prompts]
        Tp = self._bucket(max(lens))
        padded = np.zeros((B, 1, Tp), np.int32)
        for i, p in enumerate(prompts):
            padded[i, 0, : lens[i]] = np.asarray(p, np.int32)
        plens = jnp.asarray(lens, jnp.int32)

        cache, dcache = self.init_caches()
        caches = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), (cache, dcache))
        keys = jax.random.split(jax.random.PRNGKey(seed), B)

        kb = ("batch", Tp)
        prefill_b = self._prefill_jit.get(kb)
        if prefill_b is None:
            prefill_b = jax.jit(jax.vmap(
                self._prefill, in_axes=(None, None, 0, 0, 0, 0, 0, None)))
            self._prefill_jit[kb] = prefill_b
        state = prefill_b(self.params, self.dparams, jnp.asarray(padded),
                          plens, caches[0], caches[1], keys,
                          self._temp(temperature))

        round_b = self._round_jit_batched
        if round_b is None:
            round_b = jax.jit(
                jax.vmap(lambda p, dp, s: self._round(p, dp, s, batched=True),
                         in_axes=(None, None, 0)),
                donate_argnums=(2,))
            self._round_jit_batched = round_b

        outs = [list(np.asarray(p)) for p in prompts]
        new_counts = [0] * B
        done = [False] * B
        while not all(done):
            state, r = round_b(self.params, self.dparams, state)
            alens = np.asarray(r.accept_len)
            toks = np.asarray(r.new_tokens)
            rdone = np.asarray(r.done)
            for i in range(B):
                if done[i]:
                    continue
                for t in toks[i, : alens[i] + 1]:
                    if new_counts[i] >= max_new_tokens:
                        # trim in-round overshoot — the single-sequence
                        # path caps at exactly max_new (_trim_overshoot),
                        # and batched outputs must match it token-for-token
                        done[i] = True
                        break
                    outs[i].append(int(t))
                    new_counts[i] += 1
                    if (self.eos_token_id is not None
                            and t == self.eos_token_id):
                        done[i] = True
                        break
                if new_counts[i] >= max_new_tokens or rdone[i] or \
                        len(outs[i]) + self.path_len + 1 >= self.ecfg.max_len:
                    done[i] = True
        return [np.asarray(o) for o in outs]

    def generate_stream(self, prompt_ids, max_new_tokens: int = 512,
                        eos_token_id: Optional[int] = None, seed: int = 0,
                        temperature: Optional[float] = None):
        """Streaming speculative generation (ea_generate, ea_model.py:383-485
        analog): yields (all_ids_so_far, round_stats) after every decode
        round, for token-streaming UIs."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(1, -1)
        Lp = prompt.shape[1]
        Tp = self._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = prompt
        cache, dcache = self.init_caches()
        key = jax.random.PRNGKey(seed)
        prefill = self._prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(self._prefill, donate_argnums=(4, 5))
            self._prefill_jit[Tp] = prefill
        state = prefill(self.params, self.dparams, jnp.asarray(padded),
                        jnp.int32(Lp), cache, dcache, key,
                        self._temp(temperature))
        out = list(prompt[0])
        new_tokens = rounds = 0
        while new_tokens < max_new_tokens:
            state, r = self._round_jit(self.params, self.dparams, state)
            alen = int(r.accept_len)
            if alen < 0:
                break
            rounds += 1
            stop = False
            for t in np.asarray(r.new_tokens[: alen + 1]):
                out.append(int(t))
                new_tokens += 1
                if (eos_token_id is not None and t == eos_token_id) or \
                        new_tokens >= max_new_tokens:
                    stop = True
                    break
            yield np.asarray(out), {"new_tokens": new_tokens,
                                    "rounds": rounds, "accept_len": alen}
            if stop or len(out) + self.path_len + 1 >= self.ecfg.max_len:
                break

    # ------------------------------------------------------------------
    # vanilla baseline (naivegenerate, ea_model.py:306-382)
    # ------------------------------------------------------------------

    def _vanilla_prefill(self, params, tokens, prompt_len, cache, key,
                         temperature=None):
        Tp = tokens.shape[1]
        S = cache.max_len
        pos = jnp.arange(Tp, dtype=jnp.int32)[None]
        mask = prefill_mask(Tp, S, cache.length)
        res = transformer.forward(params, self.cfg, tokens, cache, pos, mask)
        logits = transformer.lm_head(params, self.cfg,
                                     res.hidden[0, prompt_len - 1])
        key, k1 = jax.random.split(key)
        nxt = self._pick_token(logits, k1, temperature)
        return with_length(res.cache, prompt_len[None]), nxt, key

    def _vanilla_step(self, params, cache, token, key,
                      kv_limit: Optional[int] = None, temperature=None):
        if kv_limit is not None and kv_limit < cache.max_len:
            small = slice_rows(cache, kv_limit)
            new_small, nxt, key = self._vanilla_step(params, small, token,
                                                     key,
                                                     temperature=temperature)
            # a vanilla step appends exactly ONE row at `length` — write
            # back that row, not the whole bucket (see _round)
            merged = merge_rows_window(cache, new_small, cache.length, 1)
            return merged, nxt, key
        S = cache.max_len
        pos = cache.length[0][None, None]
        mask = prefill_mask(1, S, cache.length)
        res = transformer.forward(params, self.cfg, token[None, None],
                                  cache, pos, mask)
        logits = transformer.lm_head(params, self.cfg, res.hidden[0, 0])
        key, k1 = jax.random.split(key)
        nxt = self._pick_token(logits, k1, temperature)
        return res.cache, nxt, key

    def _vanilla_scan(self, params, cache, token, key, n_steps: int,
                      temperature=None):
        """Fused device-side decode: one dispatch for n_steps tokens."""
        buckets = self._kv_buckets()

        def body(carry, _):
            cache, token, key = carry
            if buckets is None:
                new_cache, nxt, key = self._vanilla_step(
                    params, cache, token, key, temperature=temperature)
            else:
                idx = self._bucket_index(cache.length[0], buckets)
                new_cache, nxt, key = jax.lax.switch(
                    idx,
                    [(lambda c, t, k, b=b: self._vanilla_step(
                        params, c, t, k, kv_limit=b, temperature=temperature))
                     for b in buckets],
                    cache, token, key)
            return (new_cache, nxt, key), token

        (cache, _, _), toks = jax.lax.scan(
            body, (cache, token, key), None, length=n_steps)
        return toks

    def generate_vanilla_stream(self, prompt_ids, max_new_tokens: int = 512,
                                eos_token_id: Optional[int] = None,
                                seed: int = 0,
                                temperature: Optional[float] = None):
        """Streaming vanilla decoding (naive_generate, ea_model.py:486-558
        analog): yields (all_ids_so_far, stats) per token."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(1, -1)
        Lp = prompt.shape[1]
        Tp = self._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = prompt
        e, c = self.ecfg, self.cfg
        cache = self.init_target_cache()
        key = jax.random.PRNGKey(seed)
        temp = self._temp(temperature)
        prefill = self._vanilla_prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(self._vanilla_prefill, donate_argnums=(3,))
            self._vanilla_prefill_jit[Tp] = prefill
        cache, token, key = prefill(self.params, jnp.asarray(padded),
                                    jnp.int32(Lp), cache, key, temp)
        out = list(prompt[0])
        for n in range(max_new_tokens):
            t = int(token)
            out.append(t)
            yield np.asarray(out), {"new_tokens": n + 1, "rounds": n + 1,
                                    "accept_len": 0}
            if eos_token_id is not None and t == eos_token_id:
                break
            if len(out) + 1 >= e.max_len:
                break
            cache, token, key = self._vanilla_step_jit(
                self.params, cache, token, key, temperature=temp)

    def generate_vanilla(self, prompt_ids, max_new_tokens: int = 512,
                         eos_token_id: Optional[int] = None, seed: int = 0,
                         fused: bool = False,
                         temperature: Optional[float] = None):
        prompt = np.asarray(prompt_ids, np.int32).reshape(1, -1)
        Lp = prompt.shape[1]
        Tp = self._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = prompt
        e, c = self.ecfg, self.cfg
        cache = self.init_target_cache()
        key = jax.random.PRNGKey(seed)
        temp = self._temp(temperature)

        prefill = self._vanilla_prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(self._vanilla_prefill, donate_argnums=(3,))
            self._vanilla_prefill_jit[Tp] = prefill
        cache, token, key = prefill(self.params, jnp.asarray(padded),
                                    jnp.int32(Lp), cache, key, temp)
        out = list(prompt[0])
        if fused:
            scan = self._vanilla_scan_jit.get(max_new_tokens)
            if scan is None:
                scan = jax.jit(functools.partial(
                    self._vanilla_scan, n_steps=max_new_tokens),
                    donate_argnums=(1,))
                self._vanilla_scan_jit[max_new_tokens] = scan
            toks = np.asarray(scan(self.params, cache, token, key,
                                   temperature=temp))
            for t in toks:
                out.append(int(t))
                if eos_token_id is not None and t == eos_token_id:
                    break
            return np.asarray(out)
        for _ in range(max_new_tokens):
            t = int(token)
            out.append(t)
            if eos_token_id is not None and t == eos_token_id:
                break
            if len(out) + 1 >= e.max_len:
                break
            cache, token, key = self._vanilla_step_jit(
                self.params, cache, token, key, temperature=temp)
        return np.asarray(out)


def _bucket(n: int, quantum: int = 128) -> int:
    """Pad prompt lengths to fixed buckets → one compile per bucket."""
    return max(quantum, -(-n // quantum) * quantum)


def calibrate_total_tokens(params: dict, cfg: ModelConfig,
                           candidates=(40, 48, 50, 56, 60),
                           weights=(1.0, 1.05, 1.07, 1.1, 1.13),
                           max_len: int = 2048, reps: int = 20,
                           batch: int = 1, kv_quant: str = "none",
                           _debug_timings: Optional[list] = None) -> int:
    """Auto-tune the tree size: time a target forward at each candidate
    token count and pick the weighted argmin (ea_model.py:148-168 analog —
    the reference runs this when total_token == -1). Larger trees raise τ
    but lengthen the verify forward; the weights encode the reference's
    empirical τ gain per size step.

    batch > 1 calibrates the batched-serving verify: with B sequences the
    tree forward is compute-bound (B·n tokens through the target each
    round), so verify time grows ~linearly in n and the weighted argmin
    shifts toward smaller trees — the serving-throughput knob the B=1
    tuner cannot see.

    Timing note: each rep transfers one logits ROW to the host inside the
    timed region. `block_until_ready()` does NOT block through the axon
    relay (CLAUDE.md) — a wait-only loop measures ~0.1 ms regardless of
    work, so the argmin would be noise on real hardware. The per-rep host
    transfer ([V] fp32, ~0.5 MB — negligible vs a target forward) is what
    makes every candidate's timing real; it is the engine's own
    generate_* np.asarray pattern applied here."""
    import time

    timings = []
    for n in candidates:
        cache = init_cache(cfg.num_layers, batch, cfg.num_kv_heads, max_len,
                           cfg.head_dim, dtype=cfg.dtype, kv_quant=kv_quant)
        tokens = jnp.zeros((batch, n), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                               (batch, n))

        @jax.jit
        def fwd(params, tokens, cache, pos):
            mask = prefill_mask(tokens.shape[1], cache.max_len, cache.length)
            res = transformer.forward(params, cfg, tokens, cache, pos, mask)
            return transformer.lm_head(params, cfg, res.hidden[:, -1])

        np.asarray(fwd(params, tokens, cache, pos))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fwd(params, tokens, cache, pos))
        timings.append((time.perf_counter() - t0) / reps)
    if _debug_timings is not None:
        _debug_timings.extend(timings)
    scores = [t * w for t, w in zip(timings, weights)]
    return candidates[int(np.argmin(scores))]
