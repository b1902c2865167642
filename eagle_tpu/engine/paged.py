"""PagedEagleServer — continuous batching over a shared KV page pool.

`EagleServer` (engine/server.py) gives every slot a dense
`batch × max_len`-row target KV slab, the reference's allocation model
(/root/reference/eagle/model/kv_cache.py:4-157) batched up. That bounds
concurrency by the *worst-case* context per slot. This subclass stores
target KV in a shared page pool (ops/paged_kv.py): per-slot block tables map
logical rows to pages, pages are allocated as sequences grow and recycled
when they finish, so HBM capacity scales with the sum of live context
lengths — the vLLM serving model, built TPU-native (fixed shapes, block
tables as traced data, gather→round→scatter around the unmodified
speculative round, which keeps paged greedy output bit-identical to the
dense server and to `generate_vanilla`).

What is paged: the target KV (L layers — the dominant allocation). The
draft KV stays dense per slot (1 layer for EAGLE-3 — a few % of the
target's), as do the token buffers (int32).

Preemption: when the pool cannot cover a running slot's growth, the
youngest active request is evicted — its pages freed, its context so far
requeued as a fresh prompt (prefill-resume). Greedy decoding is Markov in
the committed tokens, so a preempted-and-resumed request still produces
bit-identical output; sampled requests resume on a fresh RNG fold (the
trajectory up to preemption is kept, the continuation re-randomizes —
the same contract as vLLM recompute preemption). The pool must be large
enough for any single request's worst case (one slot's pages); anything
beyond that only changes how many requests run concurrently.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import draft as draft_mod
from ..models import transformer
from ..ops.kv_cache import KVCache, with_length
from ..ops.masks import prefill_mask
from ..ops.paged_kv import (PagePool, gather_windows, init_pool,
                            scatter_prefix, scatter_rows)
from ..ops.tree import Tree
from .engine import EagleEngine, EngineState, _target_feats
from .prefix_cache import PrefixEntry, PrefixStore
from .server import EagleServer, _Request, _Slot


class PagedSlotState(NamedTuple):
    """EngineState minus the dense target cache (which lives in the pool)."""
    tokens: jnp.ndarray
    length: jnp.ndarray
    dcache: KVCache
    tree: Tree
    key: jax.Array
    done: jnp.ndarray
    temperature: jnp.ndarray


def _strip(st: EngineState) -> PagedSlotState:
    return PagedSlotState(tokens=st.tokens, length=st.length,
                          dcache=st.dcache, tree=st.tree, key=st.key,
                          done=st.done, temperature=st.temperature)


def _opt0(x):
    """x[None] for optional arrays (int8-KV scale side arrays)."""
    return None if x is None else x[None]


@dataclass
class _PrefillJob:
    """A chunked prefill in flight: the prompt's KV rows land in the pool
    one fixed-size chunk per scheduler step, so a long prompt never stalls
    running decode rounds for more than one chunk forward (vLLM's chunked
    prefill, TPU-native: every chunk is the same compiled program)."""
    req: _Request
    dcache: KVCache                  # dense per-job draft KV, grown chunkwise
    pages: List[int] = field(default_factory=list)
    bt: np.ndarray = None            # [pages_per_slot] block-table row
    rows_done: int = 0               # prompt rows already in the pool
    state: Optional[PagedSlotState] = None  # set by the final chunk


class PageAllocator:
    """Host-side free-list of physical page ids. Page 0 is reserved as the
    trash page (inactive block-table entries point at it)."""

    def __init__(self, num_pages: int):
        assert num_pages >= 2, "need at least one real page + the trash page"
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, 0, -1))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self._free) < n:
            return None
        return [self._free.pop() for _ in range(n)]

    def release(self, pages: List[int]):
        self._free.extend(pages)


class PagedEagleServer(EagleServer):
    def __init__(self, engine: EagleEngine, max_batch: int = 4,
                 groups: int = 1, max_admit_per_step: Optional[int] = None,
                 page_size: int = 128, num_pages: Optional[int] = None,
                 total_tokens: Optional[int] = None,
                 depth: Optional[int] = None, top_k: Optional[int] = None,
                 prefix_cache: bool = True, prefix_entries: int = 32,
                 prefill_chunk: Optional[int] = None,
                 async_schedule: bool = False):
        """`page_size`: KV rows per page; must divide the prompt bucket
        quantum (min(128, max_len)) so prefilled buckets scatter as whole
        pages. `num_pages`: pool capacity (default: enough for every slot at
        full max_len — no memory win, pure paging; size it down to cap HBM:
        capacity then limits the SUM of live contexts, not each one).
        `prefix_cache`: finished requests donate their full KV pages to a
        prefix store; new prompts starting with a cached prefix adopt those
        pages instead of re-prefilling them (engine/prefix_cache.py).
        `prefill_chunk`: rows per chunked-prefill step (multiple of
        page_size). Prompts longer than this prefill one chunk per scheduler
        step instead of in one dispatch, so running decode rounds stall at
        most one chunk forward per step when a long prompt joins (vLLM's
        chunked prefill). Greedy outputs are unchanged — chunked prefill is
        repeated incremental prefill, the engine/session.py `_extend`
        contract."""
        super().__init__(engine, max_batch, groups, max_admit_per_step,
                         total_tokens=total_tokens, depth=depth, top_k=top_k,
                         async_schedule=async_schedule)
        eng = self.engine
        quantum = min(128, eng.ecfg.max_len)
        if quantum % page_size != 0:
            raise ValueError(
                f"page_size {page_size} must divide the prompt bucket "
                f"quantum {quantum}")
        self.P = page_size
        self._S_tok = eng._tgt_len()
        self.pages_per_slot = -(-self._S_tok // page_size)
        if num_pages is None:
            num_pages = max_batch * self.pages_per_slot + 1  # + trash page
        self.allocator = PageAllocator(num_pages)
        c = eng.cfg
        self._pool = init_pool(c.num_layers, c.num_kv_heads, num_pages,
                               page_size, c.head_dim, dtype=c.dtype,
                               kv_quant=eng.ecfg.kv_quant)
        self._bt = [np.zeros((self.Bg, self.pages_per_slot), np.int32)
                    for _ in range(groups)]
        self._pages: Dict[Tuple[int, int], List[int]] = {}
        self._round_p: Dict = {}    # window size -> jitted paged round
        self._prefill_p: Dict = {}  # prompt bucket -> jitted paged prefill
        self.preemptions = 0
        # --- automatic prefix caching (engine/prefix_cache.py)
        self.store = (PrefixStore(page_size, self.allocator.release,
                                  max_entries=prefix_entries)
                      if prefix_cache else None)
        self._borrowed: Dict[Tuple[int, int], int] = {}   # shared page count
        self._adopted: Dict[Tuple[int, int], PrefixEntry] = {}
        self._prefill_px: Dict = {}  # (npre, Te) -> jitted prefix prefill
        self._dslab_jit: Dict = {}   # R -> jitted draft-prefix slab copy
        # --- chunked prefill
        if prefill_chunk is not None and prefill_chunk % page_size != 0:
            raise ValueError(
                f"prefill_chunk {prefill_chunk} must be a multiple of "
                f"page_size {page_size}")
        self.C = prefill_chunk
        self._job: Optional[_PrefillJob] = None     # at most one chunking
        self._ready: collections.deque = collections.deque()  # await a slot
        self._chunk_jit: Dict = {}   # (C, W)  -> jitted intermediate chunk
        self._chunkf_jit: Dict = {}  # (Cf, W) -> jitted final chunk
        self.chunked_prefills = 0   # requests admitted via chunking
        self.cancelled_prefills = 0  # jobs abandoned under pool pressure

    @property
    def pool_bytes(self) -> int:
        n = self._pool.k.nbytes + self._pool.v.nbytes
        if self._pool.ks is not None:
            n += self._pool.ks.nbytes + self._pool.vs.nbytes
        return n

    def submit(self, prompt_ids, max_new_tokens: int = 512,
               seed: int = 0, temperature=None) -> int:
        """Reject requests the pool can never serve at submit time — an
        unadmittable prompt would otherwise head-of-line-block admission
        and finally abort the serve loop once running requests drain."""
        eng = self.engine
        Lp = len(prompt_ids)
        self._validate_prompt(Lp)  # before sizing: an overlong prompt must
        # report the max_len violation, not a misleading pool-size error
        worst_rows = max(eng._bucket(Lp),
                         min(self._S_tok, Lp + max_new_tokens + eng.path_len))
        need = -(-worst_rows // self.P)
        usable = self.allocator.num_pages - 1
        if need > usable:
            raise ValueError(
                f"request needs up to {need} pages over its lifetime "
                f"(prompt {Lp} + max_new {max_new_tokens}); pool holds only "
                f"{usable} usable pages — raise num_pages or shorten the "
                "request")
        return super().submit(prompt_ids, max_new_tokens, seed, temperature)

    # ------------------------------------------------------------------
    # admission
    # ------------------------------------------------------------------

    def _prefill_paged(self, params, dparams, toks, plen, cache_small,
                       dcache, key, temp, pool, pages):
        """Prefill into a prompt-bucket-sized dense scratch, scatter its KV
        into the pool, widen the token buffer to full size."""
        eng = self.engine
        st = eng._prefill(params, dparams, toks, plen, cache_small, dcache,
                          key, temp)
        big = jnp.zeros((1, self._S_tok), jnp.int32)
        big = jax.lax.dynamic_update_slice(big, st.tokens, (0, 0))
        pool = scatter_prefix(pool, pages, st.cache.k, st.cache.v, self.P,
                              cache_ks=st.cache.ks, cache_vs=st.cache.vs)
        return pool, _strip(st)._replace(tokens=big)

    def _alloc_pages(self, n: int) -> Optional[List[int]]:
        """Allocate n pages, evicting LRU prefix-cache entries if needed."""
        got = self.allocator.alloc(n)
        if got is None and self.store is not None:
            self.store.evict(n - self.allocator.free_pages)
            got = self.allocator.alloc(n)
        return got

    def _suffix_fits(self, req: _Request, rows: int) -> bool:
        """Adoption may preempt chunked prefill only when the un-cached
        suffix (boundary row + delta) is at most one chunk — a longer
        suffix would run as one giant unchunked adoption prefill, the
        exact join spike chunking exists to prevent."""
        return self.C is None or \
            len(req.prompt) - (rows - 1) <= self.C

    def _place(self, req: _Request, g: int, slot_idx: int) -> bool:
        if self.store is not None:
            hit = self.store.lookup(req.prompt)
            if hit is not None and self._suffix_fits(req, hit[1]) and \
                    self._place_prefix(req, g, slot_idx, *hit):
                return True
        if self.C is not None and len(req.prompt) > self.C:
            return False  # long prompts go through the chunker (one at a
            # time: the head waits for the in-flight job, keeping admission
            # in arrival order)
        eng = self.engine
        padded, Lp, Tp = self._pad_prompt(req)
        npg = Tp // self.P
        pages = self._alloc_pages(npg)
        if pages is None:
            if not any(s.active for grp in self.slots for s in grp):
                raise RuntimeError(
                    f"page pool too small: prompt needs {npg} pages, pool "
                    f"has {self.allocator.num_pages - 1} usable total")
            return False  # wait for running requests to free pages
        fn = self._prefill_p.get(Tp)
        if fn is None:
            # donate dcache + pool (aliased into outputs); the prompt-scratch
            # cache is consumed by the page scatter, nothing aliases it
            fn = jax.jit(self._prefill_paged, donate_argnums=(5, 8))
            self._prefill_p[Tp] = fn
        self._pool, st = fn(
            eng.params, eng.dparams, padded, jnp.int32(Lp),
            eng.init_target_cache(rows=Tp), eng.init_draft_cache(),
            jax.random.PRNGKey(req.seed), eng._temp(req.temperature),
            self._pool, jnp.asarray(pages, jnp.int32))
        self._pages[(g, slot_idx)] = pages
        self._bt[g][slot_idx, :] = 0
        self._bt[g][slot_idx, :npg] = pages
        self._ensure_state(g, st)
        self._insert(g, slot_idx, st)
        self._bind_slot(req, g, slot_idx)
        return True

    # ------------------------------------------------------------------
    # chunked prefill
    # ------------------------------------------------------------------

    def _wbucket(self, n: int) -> int:
        """Gather-window bucket for chunk forwards: multiples of 2·C bound
        the program count to ~max_len/(2C) while keeping window reads within
        2 chunks of the live rows."""
        q = 2 * self.C
        return min(-(-n // q) * q, self._S_tok)

    def _make_chunk(self, C: int, W: int):
        """Jitted intermediate chunk: target-forward rows [R, R+C) of the
        prompt against the pool window [0, W), scatter their KV back, and
        extend the job's draft cache with the chunk's (feature, next-token)
        pairs — the whole prompt is known, so every pair's next token is
        available without sampling. No tree is built (that's the final
        chunk's job)."""
        eng, P = self.engine, self.P

        def fn(params, dparams, win_tokens, next_tokens, R, pool, bt,
               dcache):
            win_k, win_v, win_ks, win_vs = gather_windows(pool, bt[None], W,
                                                          P)
            cache = KVCache(k=win_k[0], v=win_v[0], length=R[None],
                            ks=None if win_ks is None else win_ks[0],
                            vs=None if win_vs is None else win_vs[0])
            pos = (R + jnp.arange(C, dtype=jnp.int32))[None]
            mask = prefill_mask(C, W, cache.length)
            res = transformer.forward(params, eng.cfg, win_tokens, cache,
                                      pos, mask)
            pool = scatter_rows(pool, bt[None], res.cache.k[None],
                                res.cache.v[None], R[None], C, P,
                                active=jnp.ones((1,), bool),
                                window_ks=_opt0(res.cache.ks),
                                window_vs=_opt0(res.cache.vs))
            feats = _target_feats(res, eng.dcfg.version)       # [1, C, F]
            dmask = prefill_mask(C, dcache.max_len, dcache.length)
            dres = draft_mod.forward(dparams, eng.dcfg, next_tokens[None],
                                     feats, dcache, pos, dmask)
            return pool, with_length(dres.cache, (R + C)[None])

        return jax.jit(fn, donate_argnums=(5, 7))

    def _make_chunk_final(self, Cf: int, W: int):
        """Jitted final chunk: forward the last `m` prompt rows (padded to
        Cf), sample the root token from row m-1's logits, and build the
        first draft tree — the tail of `EagleEngine._prefill`, against pool
        pages. The PRNG stream (split 3: root, draft) matches `_prefill`'s,
        so sampled outputs are bit-identical to unchunked admission too."""
        eng, P = self.engine, self.P

        def fn(params, dparams, full_tokens, win_tokens, next_tokens, m, R,
               pool, bt, dcache, key, temperature):
            win_k, win_v, win_ks, win_vs = gather_windows(pool, bt[None], W,
                                                          P)
            cache = KVCache(k=win_k[0], v=win_v[0], length=R[None],
                            ks=None if win_ks is None else win_ks[0],
                            vs=None if win_vs is None else win_vs[0])
            pos = (R + jnp.arange(Cf, dtype=jnp.int32))[None]
            mask = prefill_mask(Cf, W, cache.length)
            res = transformer.forward(params, eng.cfg, win_tokens, cache,
                                      pos, mask)
            last_logits = transformer.lm_head(params, eng.cfg,
                                              res.hidden[0, m - 1])
            key, k1, kd = jax.random.split(key, 3)
            root = eng._pick_token(last_logits, k1, temperature)
            pool = scatter_rows(pool, bt[None], res.cache.k[None],
                                res.cache.v[None], R[None], Cf, P,
                                active=jnp.ones((1,), bool),
                                window_ks=_opt0(res.cache.ks),
                                window_vs=_opt0(res.cache.vs))
            feats = _target_feats(res, eng.dcfg.version)[0]    # [Cf, F]
            ext_tokens = next_tokens.at[m - 1].set(root)
            dr = eng._draft_round(dparams, ext_tokens, feats, m, dcache,
                                  key=kd, temperature=temperature)
            st = PagedSlotState(tokens=full_tokens, length=R + m,
                                dcache=dr.dcache, tree=dr.tree, key=key,
                                done=jnp.bool_(False),
                                temperature=temperature)
            return pool, st

        return jax.jit(fn, donate_argnums=(7, 9))

    def _start_job(self, req: _Request):
        self._job = _PrefillJob(
            req=req, dcache=self.engine.init_draft_cache(),
            bt=np.zeros((self.pages_per_slot,), np.int32))
        self.chunked_prefills += 1

    def _install_job(self, job: _PrefillJob, g: int, slot_idx: int):
        self._pages[(g, slot_idx)] = job.pages
        self._bt[g][slot_idx, :] = 0
        self._bt[g][slot_idx, :len(job.pages)] = job.pages
        self._ensure_state(g, job.state)
        self._insert(g, slot_idx, job.state)
        self._bind_slot(job.req, g, slot_idx)

    def _advance_prefill(self):
        """One chunked-prefill step: place any finished job waiting for a
        slot, then dispatch ONE chunk of the in-flight job (so chunk
        forwards interleave 1:1 with decode rounds)."""
        while self._ready:
            pos = self._pick_free_slot(len(self._ready[0].req.prompt))
            if pos is None:
                break
            self._install_job(self._ready.popleft(), *pos)
        job = self._job
        if job is None:
            return
        eng, P, C = self.engine, self.P, self.C
        prompt = job.req.prompt
        Lp, R = len(prompt), job.rows_done
        final = (Lp - R) <= C
        rows_end = min(R + (eng._bucket(Lp - R) if final else C),
                       self._S_tok)
        need = -(-rows_end // P)
        if len(job.pages) < need:
            got = self._alloc_pages(need - len(job.pages))
            if got is None:
                if not any(s.active for grp in self.slots for s in grp) \
                        and not self._ready:
                    raise RuntimeError(
                        "page pool exhausted mid-chunked-prefill with no "
                        "running requests to drain — size num_pages for at "
                        "least one full-length request")
                return  # wait for running requests to free pages
            job.bt[len(job.pages):need] = got
            job.pages.extend(got)
        bt = jnp.asarray(job.bt)
        if not final:
            W = self._wbucket(R + C)
            fn = self._chunk_jit.get((C, W))
            if fn is None:
                fn = self._make_chunk(C, W)
                self._chunk_jit[(C, W)] = fn
            self._pool, job.dcache = fn(
                eng.params, eng.dparams, jnp.asarray(prompt[R:R + C][None]),
                jnp.asarray(prompt[R + 1:R + C + 1]), jnp.int32(R),
                self._pool, bt, job.dcache)
            job.rows_done = R + C
            return
        m = Lp - R
        Cf = rows_end - R
        W = self._wbucket(rows_end)
        fn = self._chunkf_jit.get((Cf, W))
        if fn is None:
            fn = self._make_chunk_final(Cf, W)
            self._chunkf_jit[(Cf, W)] = fn
        win = np.zeros((1, Cf), np.int32)
        win[0, :m] = prompt[R:]
        nxt = np.zeros((Cf,), np.int32)
        nxt[:m - 1] = prompt[R + 1:]
        full = np.zeros((1, self._S_tok), np.int32)
        full[0, :Lp] = prompt
        self._pool, job.state = fn(
            eng.params, eng.dparams, jnp.asarray(full), jnp.asarray(win),
            jnp.asarray(nxt), jnp.int32(m), jnp.int32(R), self._pool, bt,
            job.dcache, jax.random.PRNGKey(job.req.seed),
            eng._temp(job.req.temperature))
        self._job = None
        pos = self._pick_free_slot(Lp)
        if pos is not None:
            self._install_job(job, *pos)
        else:
            self._ready.append(job)

    def _cancel_one_job(self) -> bool:
        """Abandon a chunked prefill under pool pressure — running requests
        outrank waiting prefills (vLLM's preemption order). Pages return to
        the pool; the request goes back to the queue head. Chunked prefill
        replays the same PRNG stream, so a cancelled-and-restarted request
        still produces identical output."""
        if self._job is not None:
            job, self._job = self._job, None
        elif self._ready:
            job = self._ready.pop()   # newest first: least total sunk cost
        else:
            return False
        self.allocator.release(job.pages)
        self.queue.appendleft(job.req)
        self.chunked_prefills -= 1
        self.cancelled_prefills += 1
        return True

    def _admit(self):
        self._advance_prefill()
        # start chunking the queue head if it's long, even with no free slot
        # (that's the point: its prefill overlaps running decode) — unless a
        # cached prefix covers it, in which case adoption is cheaper still
        if (self.C is not None and self.queue and self._job is None
                and not self._ready):
            req = self.queue[0]
            hit = (self.store.lookup(req.prompt)
                   if self.store is not None else None)
            if len(req.prompt) > self.C and (
                    hit is None or not self._suffix_fits(req, hit[1])):
                self._start_job(req)
                self.queue.popleft()
        super()._admit()

    def _idle(self) -> bool:
        return (super()._idle() and self._job is None and not self._ready)

    def cancel(self, request_id: int) -> bool:
        """Also covers a request mid-chunked-prefill (job or slot-wait)."""
        job = None
        if self._job is not None and \
                self._job.req.request_id == request_id:
            job, self._job = self._job, None
        else:
            for k, j in enumerate(self._ready):
                if j.req.request_id == request_id:
                    job = j
                    del self._ready[k]
                    break
        if job is not None:
            self.allocator.release(job.pages)
            self.outputs.pop(request_id, None)
            self.chunked_prefills -= 1
            return True
        return super().cancel(request_id)

    # ------------------------------------------------------------------
    # automatic prefix caching (engine/prefix_cache.py)
    # ------------------------------------------------------------------

    def _make_prefix_prefill(self, npre: int, Te: int):
        """Jitted adoption prefill: `npre` shared prefix pages (rows [0, R))
        are already in the pool; forward only the window [R-1, R-1+Te) —
        the boundary row R-1 is recomputed because its draft pair's input
        token differs per continuation (engine/session.py's incremental-
        prefill trick), but its bit-identical target KV is NOT scattered
        back, so shared pages stay read-only."""
        eng, P = self.engine, self.P
        R = npre * P
        W = R + Te  # gather window covering every row the forward reads

        def fn(params, dparams, full_tokens, win_tokens, n_new, pool, bt,
               dk_pre, dv_pre, key, temperature):
            start = jnp.int32(R - 1)
            win_k, win_v, win_ks, win_vs = gather_windows(pool, bt[None], W,
                                                          P)
            cache = KVCache(k=win_k[0], v=win_v[0], length=start[None],
                            ks=None if win_ks is None else win_ks[0],
                            vs=None if win_vs is None else win_vs[0])
            pos = (start + jnp.arange(Te, dtype=jnp.int32))[None]
            mask = prefill_mask(Te, W, cache.length)
            res = transformer.forward(params, eng.cfg, win_tokens, cache,
                                      pos, mask)
            last_logits = transformer.lm_head(params, eng.cfg,
                                              res.hidden[0, n_new - 1])
            key, k1, kd = jax.random.split(key, 3)
            root = eng._pick_token(last_logits, k1, temperature)
            # suffix rows [R, R-1+Te) land in this slot's own pages
            pool = scatter_rows(pool, bt[None], res.cache.k[None],
                                res.cache.v[None], (start + 1)[None],
                                Te - 1, P, active=jnp.ones((1,), bool),
                                window_ks=_opt0(res.cache.ks),
                                window_vs=_opt0(res.cache.vs))
            feats = _target_feats(res, eng.dcfg.version)[0]        # [Te, F]
            ext_tokens = jnp.concatenate(
                [win_tokens[0, 1:], jnp.zeros((1,), jnp.int32)]
            ).at[n_new - 1].set(root)
            dc0 = eng.init_draft_cache()
            dcache = KVCache(
                k=jax.lax.dynamic_update_slice(dc0.k, dk_pre,
                                               (0, 0, 0, 0, 0)),
                v=jax.lax.dynamic_update_slice(dc0.v, dv_pre,
                                               (0, 0, 0, 0, 0)),
                length=start[None])
            dr = eng._draft_round(dparams, ext_tokens, feats, n_new, dcache,
                                  key=kd, temperature=temperature)
            st = PagedSlotState(tokens=full_tokens, length=start + n_new,
                                dcache=dr.dcache, tree=dr.tree, key=key,
                                done=jnp.bool_(False),
                                temperature=temperature)
            return pool, st

        return jax.jit(fn, donate_argnums=(5,))

    def _place_prefix(self, req: _Request, g: int, slot_idx: int,
                      entry: PrefixEntry, R: int) -> bool:
        """Admit `req` by adopting the first R rows of a cached prefix
        (R ≤ entry.rows — page-granular matches adopt only the shared
        pages). Returns False when it doesn't fit (caller falls back to
        the full prefill)."""
        eng, P = self.engine, self.P
        npre = R // P
        m = len(req.prompt) - (R - 1)      # boundary row + appended tokens
        Te = eng._bucket(m)
        if R + Te > self._S_tok:
            return False
        # pin the entry BEFORE allocating: _alloc_pages may evict LRU
        # entries to satisfy the request, and an unpinned `entry`
        # (borrowers == 0) could be freed mid-adoption — its pages would
        # re-enter the pool and the block table would map the suffix at
        # the wrong logical rows, silently decoding against garbage KV
        self.store.acquire(entry)
        suffix = self._alloc_pages(Te // P)
        if suffix is None:
            self.store.release(entry)
            return False
        win = np.zeros((1, Te), np.int32)
        win[0, :m] = req.prompt[R - 1:]
        full = np.zeros((1, self._S_tok), np.int32)
        full[0, :len(req.prompt)] = req.prompt
        fn = self._prefill_px.get((npre, Te))
        if fn is None:
            fn = self._make_prefix_prefill(npre, Te)
            self._prefill_px[(npre, Te)] = fn
        # page-granular match: take only the shared first `npre` pages.
        # entry.dk/dv may cover MORE rows than R — the adoption prefill
        # writes them into a fresh draft cache whose length is R-1, so the
        # extra rows sit beyond `length` and are overwritten by the draft
        # round before any read (same argument as the recomputed boundary
        # row); jit re-specializes on the slab shape.
        chain = entry.all_pages()[:npre]
        pages = chain + suffix
        bt_row = np.zeros((self.pages_per_slot,), np.int32)
        bt_row[:len(pages)] = pages
        self._pool, st = fn(
            eng.params, eng.dparams, jnp.asarray(full), jnp.asarray(win),
            jnp.int32(m), self._pool, jnp.asarray(bt_row), entry.dk,
            entry.dv, jax.random.PRNGKey(req.seed),
            eng._temp(req.temperature))
        self._pages[(g, slot_idx)] = pages
        self._borrowed[(g, slot_idx)] = npre
        self._adopted[(g, slot_idx)] = entry  # holds the acquire above
        self._bt[g][slot_idx, :] = 0
        self._bt[g][slot_idx, :len(pages)] = pages
        self._ensure_state(g, st)
        self._insert(g, slot_idx, st)
        self._bind_slot(req, g, slot_idx)
        self.store.hits += 1
        self.store.reused_tokens += R - 1
        return True

    def _donate_prefix(self, g: int, slot_idx: int, slot: _Slot,
                       pages: List[int], borrowed: int,
                       entry: Optional[PrefixEntry],
                       own: List[int]) -> List[int]:
        """On finish, donate the slot's full-page prefix (pages + the draft
        KV rows they cover) to the store. Returns the pages the slot still
        owns (to be freed)."""
        ctx = self.finished[slot.request_id]
        npre_f = min(len(ctx) // self.P, len(pages))
        if npre_f <= borrowed or npre_f < 1:
            return own  # nothing cacheable beyond the adopted prefix
        R = npre_f * self.P
        fn = self._dslab_jit.get(R)
        if fn is None:
            fn = jax.jit(lambda k, v, i: (jnp.take(k, i, axis=0)[..., :R, :],
                                          jnp.take(v, i, axis=0)[..., :R, :]))
            self._dslab_jit[R] = fn
        dc = self._states[g].dcache
        dk, dv = fn(dc.k, dc.v, jnp.int32(slot_idx))
        # parent_take = the slot's adoption depth: a page-granular adopter
        # extends its parent at `borrowed` pages, not at the parent's full
        # coverage — all_pages() must splice the chain there
        e = self.store.insert(ctx[:R], pages[borrowed:npre_f], entry, dk, dv,
                              parent_take=borrowed)
        if e is None:
            return own  # this exact prefix is already cached
        return pages[npre_f:]  # store took ownership of [borrowed, npre_f)

    def _grow(self, g: int):
        """Ensure every active slot's pages cover this round's scatter-back
        window [length, length + path_len). Lengths come from exact host
        bookkeeping (prompt_len + emitted) — no device sync."""
        eng = self.engine
        for i, slot in enumerate(self.slots[g]):
            if not slot.active:
                continue
            # async scheduling: host `committed` lags the in-flight round
            # by up to one commit window (self._lag), and the next round's
            # scatter lands up to path_len rows past the true length
            committed = slot.prompt_len + slot.emitted + self._lag
            need = min(-(-(committed + eng.path_len) // self.P),
                       self.pages_per_slot)
            pages = self._pages[(g, i)]
            while len(pages) < need:
                got = self._alloc_pages(need - len(pages))
                if got is not None:
                    self._bt[g][i, len(pages):need] = got
                    pages.extend(got)
                    break
                if self._cancel_one_job():
                    continue
                if not self._preempt_one(protect=(g, i)):
                    raise RuntimeError(
                        "page pool exhausted: a single request needs more "
                        "pages than the pool holds — size num_pages for at "
                        "least one full-length request")

    def _preempt_one(self, protect: Tuple[int, int]) -> bool:
        """Evict the youngest active request (≠ protect): free its pages and
        requeue its context-so-far as a fresh prompt (prefill-resume)."""
        cands = [(grp, j, s)
                 for grp in range(self.G)
                 for j, s in enumerate(self.slots[grp])
                 if s.active and (grp, j) != protect]
        if not cands:
            return False
        g, i, s = max(cands, key=lambda t: t[2].admit_seq)
        ctx = np.asarray(self.outputs[s.request_id], np.int32)
        self.queue.appendleft(_Request(
            s.request_id, ctx, s.max_new - s.emitted, s.seed, s.temperature,
            admit_seq=s.admit_seq))
        self._release_slot(g, i)
        self.preemptions += 1
        return True

    # ------------------------------------------------------------------
    # round dispatch
    # ------------------------------------------------------------------

    def _make_round(self, window: int):
        eng, P, path_len = self.engine, self.P, self.engine.path_len

        def fn(params, dparams, pool, states, bt):
            win_k, win_v, win_ks, win_vs = gather_windows(pool, bt, window, P)
            starts, pre_active = states.length, ~states.done

            def per_slot(s: PagedSlotState, wk, wv, wks, wvs):
                cache = KVCache(k=wk, v=wv, length=s.length[None],
                                ks=wks, vs=wvs)
                est = EngineState(tokens=s.tokens, length=s.length,
                                  cache=cache, dcache=s.dcache, tree=s.tree,
                                  key=s.key, done=s.done,
                                  temperature=s.temperature)
                new, out = eng._round(params, dparams, est, batched=True)
                return (_strip(new), new.cache.k, new.cache.v,
                        new.cache.ks, new.cache.vs, out)

            states, wk, wv, wks, wvs, out = jax.vmap(
                per_slot, in_axes=(0, 0, 0, 0, 0))(states, win_k, win_v,
                                                   win_ks, win_vs)
            pool = scatter_rows(pool, bt, wk, wv, starts, path_len, P,
                                active=pre_active, window_ks=wks,
                                window_vs=wvs)
            return pool, states, out

        return jax.jit(fn, donate_argnums=(2, 3))

    def _dispatch_round(self, g: int):
        self._grow(g)
        eng = self.engine
        window = self._group_bucket(g) or self._S_tok
        fn = self._round_p.get(window)
        if fn is None:
            fn = self._make_round(window)
            self._round_p[window] = fn
        self._pool, self._states[g], r = fn(
            eng.params, eng.dparams, self._pool, self._states[g],
            jnp.asarray(self._bt[g]))
        return r

    def _release_slot(self, g: int, slot_idx: int):
        slot = self.slots[g][slot_idx]
        pages = self._pages.pop((g, slot_idx), None)
        borrowed = self._borrowed.pop((g, slot_idx), 0)
        entry = self._adopted.pop((g, slot_idx), None)
        if pages:
            own = pages[borrowed:]  # shared prefix pages belong to the store
            if (self.store is not None and slot.active
                    and slot.request_id in self.finished):
                own = self._donate_prefix(g, slot_idx, slot, pages,
                                          borrowed, entry, own)
            self.allocator.release(own)
        if entry is not None:
            self.store.release(entry)
        self._bt[g][slot_idx, :] = 0
        super()._release_slot(g, slot_idx)
