"""EagleServer — continuous batching of speculative decoding.

The reference's only bs>1 path is a static batch that runs all sequences in
lockstep to completion (/root/reference/eagle/modeling_eagle.py:1629-1736).
Production serving needs *continuous* batching: requests join and leave a
running batch. This server keeps a fixed number of slots, each holding an
independent EngineState; every scheduler step runs ONE vmapped speculative
round across all slots (weight streaming amortized across the batch), while
finished slots are refilled from the queue via a single-sequence prefill
scattered into the batched state.

All shapes stay fixed (slots × static tree size); slot admission is pure
host-side pytree scatter between round dispatches. Greedy outputs are
bit-identical to single-request `EagleEngine.generate` regardless of batch
composition (per-slot rounds are independent under vmap) — enforced by
tests/test_server.py.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import EagleEngine, EngineState


@dataclass
class _Slot:
    active: bool = False
    request_id: int = -1
    prompt_len: int = 0
    emitted: int = 0
    max_new: int = 0
    done_reason: Optional[str] = None


@dataclass
class _Request:
    request_id: int
    prompt: np.ndarray
    max_new: int
    seed: int
    temperature: Optional[float] = None  # None → engine default


class EagleServer:
    def __init__(self, engine: EagleEngine, max_batch: int = 4):
        self.engine = engine
        self.B = max_batch
        self.slots: List[_Slot] = [_Slot() for _ in range(max_batch)]
        self.queue: collections.deque = collections.deque()
        self.outputs: Dict[int, list] = {}
        self.finished: Dict[int, np.ndarray] = {}
        self._next_id = 0
        self._state = None  # batched EngineState
        self._round_b = None

    # ------------------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int = 512,
               seed: int = 0, temperature: Optional[float] = None) -> int:
        """`temperature` (t>0 only; requires a sampled-mode engine) rides as
        traced per-slot data — mixed temperatures in one batch are fine."""
        rid = self._next_id
        self._next_id += 1
        self.queue.append(_Request(rid, np.asarray(prompt_ids, np.int32),
                                   max_new_tokens, seed, temperature))
        self.outputs[rid] = list(np.asarray(prompt_ids, np.int32))
        return rid

    def _ensure_state(self, template: EngineState):
        if self._state is not None:
            return
        # allocate the batched state by broadcasting a template (all slots
        # start done=True → inert until a request is scattered in)
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.B,) + x.shape).copy(),
            template)
        self._state = self._state._replace(
            done=jnp.ones((self.B,), bool))

    def _prefill_one(self, req: _Request) -> EngineState:
        eng = self.engine
        Lp = len(req.prompt)
        Tp = eng._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = req.prompt
        cache, dcache = eng.init_caches()
        prefill = eng._prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(eng._prefill, donate_argnums=(4, 5))
            eng._prefill_jit[Tp] = prefill
        return prefill(eng.params, eng.dparams, jnp.asarray(padded),
                       jnp.int32(Lp), cache, dcache,
                       jax.random.PRNGKey(req.seed),
                       eng._temp(req.temperature))

    def _insert(self, slot_idx: int, st: EngineState):
        self._state = jax.tree.map(
            lambda full, one: full.at[slot_idx].set(one), self._state, st)

    def _mark_done(self, slot_idx: int):
        self._state = self._state._replace(
            done=self._state.done.at[slot_idx].set(True))

    # ------------------------------------------------------------------

    def step(self) -> Dict[int, np.ndarray]:
        """One scheduler iteration: admit queued requests into free slots,
        run one vmapped round, drain per-slot outputs. Returns
        {request_id: np tokens emitted this step}."""
        eng = self.engine
        # admission
        for i, slot in enumerate(self.slots):
            if slot.active or not self.queue:
                continue
            req = self.queue.popleft()
            st = self._prefill_one(req)
            self._ensure_state(st)
            self._insert(i, st)
            self.slots[i] = _Slot(active=True, request_id=req.request_id,
                                  prompt_len=len(req.prompt),
                                  max_new=req.max_new)

        if self._state is None or not any(s.active for s in self.slots):
            return {}

        if self._round_b is None:
            self._round_b = {}
        # length-bucketed rounds (EngineConfig.kv_buckets): the host-side
        # scheduler already syncs per step, so it picks the batch bucket
        buckets = eng._kv_buckets()
        kv_limit = None
        if buckets is not None:
            # max length over ACTIVE slots only — a freed slot's stale
            # length must not pin the batch to a large bucket (ADVICE r1)
            lens = np.asarray(self._state.length)
            live = [int(lens[i]) for i, s in enumerate(self.slots)
                    if s.active]
            need = max(live) + eng.ecfg.tree_size + eng.path_len + 1
            kv_limit = next((b for b in buckets if need <= b), buckets[-1])
        fn = self._round_b.get(kv_limit)
        if fn is None:
            fn = jax.jit(
                jax.vmap(lambda p, dp, s: eng._round(p, dp, s,
                                                     kv_limit=kv_limit),
                         in_axes=(None, None, 0)),
                donate_argnums=(2,))
            self._round_b[kv_limit] = fn
        self._state, r = fn(eng.params, eng.dparams, self._state)

        emitted: Dict[int, np.ndarray] = {}
        alens = np.asarray(r.accept_len)
        toks = np.asarray(r.new_tokens)
        rdone = np.asarray(r.done)
        for i, slot in enumerate(self.slots):
            if not slot.active:
                continue
            new = []
            for t in toks[i, : alens[i] + 1]:
                new.append(int(t))
                self.outputs[slot.request_id].append(int(t))
                slot.emitted += 1
                if (eng.eos_token_id is not None
                        and t == eng.eos_token_id):
                    slot.done_reason = "eos"
                    break
                if slot.emitted >= slot.max_new:
                    slot.done_reason = "length"
                    break
            if slot.done_reason is None and rdone[i]:
                slot.done_reason = "capacity"
            if new:
                emitted[slot.request_id] = np.asarray(new, np.int32)
            if slot.done_reason is not None:
                self.finished[slot.request_id] = np.asarray(
                    self.outputs.pop(slot.request_id), np.int32)
                self.slots[i] = _Slot()
                self._mark_done(i)
        return emitted

    def run(self, max_steps: int = 100000) -> Dict[int, np.ndarray]:
        """Drive until queue + slots drain; return all finished outputs."""
        for _ in range(max_steps):
            if not self.queue and not any(s.active for s in self.slots):
                break
            self.step()
        return dict(self.finished)
