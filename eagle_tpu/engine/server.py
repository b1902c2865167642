"""EagleServer — continuous batching of speculative decoding.

The reference's only bs>1 path is a static batch that runs all sequences in
lockstep to completion (/root/reference/eagle/modeling_eagle.py:1629-1736).
Production serving needs *continuous* batching: requests join and leave a
running batch. This server keeps a fixed number of slots, each holding an
independent EngineState; every scheduler step runs ONE vmapped speculative
round per slot-group (weight streaming amortized across the group), while
finished slots are refilled from the queue via a single-sequence prefill
scattered into the batched state.

Scheduling structure:
- Slots are partitioned into `groups` fixed-size groups, each with its own
  batched state and its own KV bucket (EngineConfig.kv_buckets). The
  scheduler places new requests into the group whose current bucket best
  fits the prompt, so one long-context request only de-buckets its own
  group — mixed-length workloads keep the length-bucketed attention win.
  groups=1 reproduces plain whole-batch rounds (one dispatch per step);
  more groups trade weight-streaming amortization for tighter buckets.
- Admission is paced: at most `max_admit_per_step` prefills are dispatched
  per step (JAX dispatch is async — the host never waits on a prefill —
  but each prefill serializes ~a prompt forward onto the device stream, so
  a burst of joins would otherwise stall every running sequence for many
  prefills back to back).

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
    # request parameters kept for paged-mode preemption (re-prefill resume)
    seed: int = 0
    temperature: Optional[float] = None
    admit_seq: int = -1
    # unique per (request, slot) binding — async scheduling matches a
    # drained round's results to the binding that was live at dispatch
    # time, so a slot rebound mid-flight never credits stale tokens
    bind_id: int = -1


@dataclass
class _Request:
    request_id: int
    prompt: np.ndarray
    max_new: int
    seed: int
    temperature: Optional[float] = None  # None → engine default
    # original admission order, preserved across paged preemption-resume
    # (-1 = never admitted; _bind_slot stamps a fresh seq)
    admit_seq: int = -1


class EagleServer:
    def __init__(self, engine: EagleEngine, max_batch: int = 4,
                 groups: int = 1, max_admit_per_step: Optional[int] = None,
                 total_tokens: Optional[int] = None,
                 depth: Optional[int] = None, top_k: Optional[int] = None,
                 async_schedule: int = 0):
        """`total_tokens`/`depth`/`top_k` re-point the engine at a
        serving-calibrated speculation tree (a params-sharing sibling via
        `EagleEngine.with_tree`). The batched round is verify-compute-bound
        — B·tree_size tokens through the target each step — so the
        throughput-optimal tree shrinks as max_batch grows; tune with
        `calibrate_total_tokens(params, cfg, batch=max_batch)`, or pass
        total_tokens=-1 to run that calibration here (the from_pretrained
        total_token=-1 convention, at serving batch size). Outputs are
        unchanged (greedy == generate_vanilla at any tree size).

        `async_schedule`: lookahead depth for async scheduling (vLLM's
        async scheduler; 0/False = sync, True = 1). Each step dispatches
        this round BEFORE draining results, and only drains rounds more
        than `async_schedule` steps old — the device stays `async_schedule`
        rounds ahead of the host, hiding the drain transfer + token
        processing/admission behind device compute. Depth 1 suffices when
        the host is colocated; deeper hides a high-latency link (remote
        TPU) at the cost of results surfacing that many steps later, a
        finishing request's slot running that many wasted rounds before
        refill, and KV buckets/pages sized `depth` commit windows
        (`engine.path_len`) pessimistically because host bookkeeping lags
        the in-flight rounds. Outputs are bit-identical to sync scheduling
        (per-slot rounds are independent; stale results are dropped by
        bind_id)."""
        assert max_batch % groups == 0, (max_batch, groups)
        if total_tokens == -1:
            from .engine import calibrate_total_tokens
            total_tokens = calibrate_total_tokens(
                engine.params, engine.cfg, max_len=engine.ecfg.max_len,
                batch=max_batch)
        engine = engine.with_tree(total_tokens=total_tokens, depth=depth,
                                  top_k=top_k)
        self.engine = engine
        self.B = max_batch
        self.G = groups
        self.Bg = max_batch // groups
        self.slots: List[List[_Slot]] = [
            [_Slot() for _ in range(self.Bg)] for _ in range(groups)]
        self.queue: collections.deque = collections.deque()
        self.outputs: Dict[int, list] = {}
        self.finished: Dict[int, np.ndarray] = {}
        self.finish_reasons: Dict[int, str] = {}  # eos | length | capacity
        self._next_id = 0
        self._states: List[Optional[EngineState]] = [None] * groups
        self._round_b: Dict = {}  # kv_limit -> jitted vmapped round (Bg)
        self.max_admit = max_admit_per_step or max_batch
        self._admit_seq = 0  # admission order, for paged preemption
        self.async_schedule = int(async_schedule)
        # bucket/page sizing margin: host bookkeeping lags the in-flight
        # rounds by at most `depth` commit windows under async scheduling
        self._lag = engine.path_len * self.async_schedule
        self._inflight: List[list] = []  # steps of [(g, out, bind snap)]
        self._bind_seq = 0

    # ------------------------------------------------------------------

    def _validate_prompt(self, n_tokens: int):
        """Reject prompts that cannot run a single decode round within
        max_len — admitting one would trace a prefill wider than the
        preallocated caches and abort the serve loop mid-flight (the same
        guard generate/stream apply, engine.py / session.py)."""
        limit = self.engine.ecfg.max_len
        if n_tokens + self.engine.path_len + 1 >= limit:
            raise ValueError(
                f"prompt of {n_tokens} tokens leaves no generation room "
                f"within max_len {limit} (needs prompt + path_len + 1 = "
                f"{n_tokens + self.engine.path_len + 1} rows)")

    def submit(self, prompt_ids, max_new_tokens: int = 512,
               seed: int = 0, temperature: Optional[float] = None) -> int:
        """`temperature` (t>0 only; requires a sampled-mode engine) rides as
        traced per-slot data — mixed temperatures in one batch are fine."""
        self._validate_prompt(len(prompt_ids))
        if temperature is not None and self.engine.ecfg.temperature == 0.0:
            # a greedy engine's compiled program never reads the traced
            # temperature — silently returning argmax output would be a
            # trap (build the engine with temperature>0, or use
            # engine.with_sampling(True))
            raise ValueError(
                "per-request temperature requires a sampled-mode engine "
                "(EngineConfig.temperature > 0)")
        rid = self._next_id
        self._next_id += 1
        self.queue.append(_Request(rid, np.asarray(prompt_ids, np.int32),
                                   max_new_tokens, seed, temperature))
        self.outputs[rid] = list(np.asarray(prompt_ids, np.int32))
        return rid

    def _ensure_state(self, g: int, template: EngineState):
        if self._states[g] is not None:
            return
        # allocate the batched state by broadcasting a template (all slots
        # start done=True → inert until a request is scattered in). Under
        # jit so XLA propagates the template's shardings (TP-sharded KV
        # leaves carry GSPMD shardings that eager broadcast can't extend).
        st = jax.jit(lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.Bg,) + x.shape), t))(template)
        self._states[g] = st._replace(done=jnp.ones((self.Bg,), bool))

    def _pad_prompt(self, req: _Request):
        """Zero-pad the prompt to its bucket: (tokens [1,Tp], Lp, Tp)."""
        Lp = len(req.prompt)
        Tp = self.engine._bucket(Lp)
        padded = np.zeros((1, Tp), np.int32)
        padded[0, :Lp] = req.prompt
        return jnp.asarray(padded), Lp, Tp

    def _prefill_one(self, req: _Request) -> EngineState:
        eng = self.engine
        padded, Lp, Tp = self._pad_prompt(req)
        cache, dcache = eng.init_caches()
        prefill = eng._prefill_jit.get(Tp)
        if prefill is None:
            prefill = jax.jit(eng._prefill, donate_argnums=(4, 5))
            eng._prefill_jit[Tp] = prefill
        return prefill(eng.params, eng.dparams, padded,
                       jnp.int32(Lp), cache, dcache,
                       jax.random.PRNGKey(req.seed),
                       eng._temp(req.temperature))

    # slot scatter/flagging run jitted (donated in-place; eager .at ops
    # can't extend the GSPMD shardings TP-sharded KV leaves carry)
    _insert_jit = staticmethod(jax.jit(
        lambda full, one, i: jax.tree.map(
            lambda f, o: f.at[i].set(o.astype(f.dtype)), full, one),
        donate_argnums=(0,)))
    _mark_done_jit = staticmethod(jax.jit(
        lambda done, i: done.at[i].set(True), donate_argnums=(0,)))

    def _insert(self, g: int, slot_idx: int, st: EngineState):
        self._states[g] = self._insert_jit(self._states[g], st,
                                           jnp.int32(slot_idx))

    def _mark_done(self, g: int, slot_idx: int):
        self._states[g] = self._states[g]._replace(
            done=self._mark_done_jit(self._states[g].done,
                                     jnp.int32(slot_idx)))

    # ------------------------------------------------------------------

    def _group_bucket(self, g: int) -> Optional[int]:
        """Current KV bucket of group g (None = unconstrained: no buckets
        configured, or no live slots). Computed from host-side slot
        bookkeeping (prompt_len + emitted = committed length) — reading
        state.length would block on the just-dispatched prefill/round and
        serialize the admission pipeline."""
        eng = self.engine
        buckets = eng._kv_buckets()
        if buckets is None or self._states[g] is None:
            return None
        live = [s.prompt_len + s.emitted for s in self.slots[g] if s.active]
        if not live:
            return None
        need = max(live) + self._lag + eng.ecfg.tree_size + eng._tail
        return next((b for b in buckets if need <= b), buckets[-1])

    def _pick_free_slot(self, prompt_rows: int) -> Optional[tuple]:
        """Free slot for a request holding `prompt_rows` context, preferring
        the group whose current bucket already covers it (so short requests
        don't land next to long-context ones). None when every slot is
        occupied."""
        eng = self.engine
        free = [(g, i) for g in range(self.G)
                for i, s in enumerate(self.slots[g]) if not s.active]
        if not free:
            return None
        buckets = eng._kv_buckets()
        if buckets is not None:
            need = prompt_rows + self._lag + eng.ecfg.tree_size + eng._tail
            req_bucket = next((b for b in buckets if need <= b), buckets[-1])

            def fit(gi):
                g, _ = gi
                gb = self._group_bucket(g)
                occupied = sum(s.active for s in self.slots[g])
                # empty/drained groups are unconstrained (distance 0) —
                # a long request must prefer them over de-bucketing an
                # active short group; among equal fits pack the fullest
                dist = 0 if gb is None else abs(gb - req_bucket)
                return (dist, -occupied)

            free.sort(key=fit)
        return free[0]

    def _admit(self):
        """Place queued requests into free slots, capped at
        max_admit_per_step prefill dispatches."""
        admitted = 0
        while self.queue and admitted < self.max_admit:
            req = self.queue[0]
            pos = self._pick_free_slot(len(req.prompt))
            if pos is None:
                break
            if not self._place(req, *pos):
                break  # backend can't take it now (e.g. paged pool full)
            self.queue.popleft()
            admitted += 1

    def _place(self, req: _Request, g: int, slot_idx: int) -> bool:
        """Prefill `req` and bind it to slot (g, slot_idx). Returns False if
        the backend cannot admit right now (base: never)."""
        st = self._prefill_one(req)
        self._ensure_state(g, st)
        self._insert(g, slot_idx, st)
        self._bind_slot(req, g, slot_idx)
        return True

    def _bind_slot(self, req: _Request, g: int, slot_idx: int):
        # a preempted-and-resumed request keeps its ORIGINAL admit_seq —
        # otherwise the resumee is always the "youngest" and the paged
        # preemptor would evict it again before it runs a single round
        # (vLLM preserves arrival order across recompute preemption)
        if req.admit_seq < 0:
            req.admit_seq = self._admit_seq
            self._admit_seq += 1
        self.slots[g][slot_idx] = _Slot(
            active=True, request_id=req.request_id,
            prompt_len=len(req.prompt), max_new=req.max_new,
            seed=req.seed, temperature=req.temperature,
            admit_seq=req.admit_seq, bind_id=self._bind_seq)
        self._bind_seq += 1

    def _dispatch_all(self) -> List[tuple]:
        """Dispatch one vmapped round per live group (async — the device
        pipelines the group dispatches back to back). Each entry carries the
        dispatch-time bind snapshot so the drain can drop stale results."""
        out = []
        for g in range(self.G):
            if self._states[g] is None or \
                    not any(s.active for s in self.slots[g]):
                continue
            snap = [s.bind_id if s.active else -1 for s in self.slots[g]]
            out.append((g, self._dispatch_round(g), snap))
        return out

    def _process_results(self, results,
                         emitted: Dict[int, np.ndarray]) -> None:
        """Drain round results (blocks on the device), append accepted
        tokens per slot, flag EOS/length/capacity finishes, release
        finished slots. Results whose slot was rebound or released since
        dispatch (async mode: preemption, refill) are dropped — their
        tokens belong to a binding that no longer exists."""
        eng = self.engine
        for g, r, snap in results:
            alens = np.asarray(r.accept_len)
            toks = np.asarray(r.new_tokens)
            rdone = np.asarray(r.done)
            for i, slot in enumerate(self.slots[g]):
                if not slot.active or slot.bind_id != snap[i]:
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
                    self.finish_reasons[slot.request_id] = slot.done_reason
                    self._release_slot(g, i)

    def step(self) -> Dict[int, np.ndarray]:
        """One scheduler iteration. Sync mode: admit queued requests into
        free slots, run one vmapped round per live group, drain per-slot
        outputs. Async mode: dispatch this step's rounds FIRST, then drain
        the previous step's (the device computes while the host blocks),
        then admit — results surface one step later. Returns
        {request_id: np tokens emitted this step}."""
        emitted: Dict[int, np.ndarray] = {}
        if not self.async_schedule:
            self._admit()
            self._process_results(self._dispatch_all(), emitted)
            return emitted
        if not any(s.active for grp in self.slots for s in grp):
            self._admit()  # bootstrap / restart from fully drained
        pending = self._dispatch_all()
        if pending:
            self._inflight.append(pending)
        # hold `depth` steps in flight; when the batch went quiet (nothing
        # dispatched) drain everything so run() terminates
        target = self.async_schedule if pending else 0
        while len(self._inflight) > target:
            self._process_results(self._inflight.pop(0), emitted)
        self._admit()
        return emitted

    def _dispatch_round(self, g: int):
        """Run one vmapped speculative round for group g (async dispatch);
        update the group state and return the batched RoundOutput."""
        eng = self.engine
        kv_limit = self._group_bucket(g)
        fn = self._round_b.get(kv_limit)
        if fn is None:
            fn = jax.jit(
                jax.vmap(lambda p, dp, s: eng._round(p, dp, s,
                                                     kv_limit=kv_limit,
                                                     batched=True),
                         in_axes=(None, None, 0)),
                donate_argnums=(2,))
            self._round_b[kv_limit] = fn
        self._states[g], r = fn(eng.params, eng.dparams, self._states[g])
        return r

    def _release_slot(self, g: int, slot_idx: int):
        """Free slot bookkeeping after its request finished."""
        self.slots[g][slot_idx] = _Slot()
        self._mark_done(g, slot_idx)

    def cancel(self, request_id: int) -> bool:
        """Abort a queued or running request (client disconnect, upstream
        stop-string hit). Frees its slot/pages; discards its pending
        output. In-flight async results for the freed binding are dropped
        by the bind_id check. Returns False if the request is unknown or
        already finished (its output stays in `finished`)."""
        for k, req in enumerate(self.queue):
            if req.request_id == request_id:
                del self.queue[k]
                self.outputs.pop(request_id, None)
                return True
        for g in range(self.G):
            for i, s in enumerate(self.slots[g]):
                if s.active and s.request_id == request_id:
                    self.outputs.pop(request_id, None)
                    self._release_slot(g, i)
                    return True
        return False

    def _idle(self) -> bool:
        """Nothing queued, running, in-flight, or (in subclasses)
        mid-prefill."""
        return (not self.queue and not self._inflight and not any(
            s.active for grp in self.slots for s in grp))

    def run(self, max_steps: int = 100000) -> Dict[int, np.ndarray]:
        """Drive until queue + slots drain; return all finished outputs."""
        for _ in range(max_steps):
            if self._idle():
                break
            self.step()
        return dict(self.finished)
