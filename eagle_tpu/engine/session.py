"""EagleSession — multi-turn generation with KV reuse (incremental prefill).

The reference's chat app re-prefills the ENTIRE conversation every turn
(/root/reference/eagle/application/webui.py:151-205 calls `ea_generate`,
which resets target and draft caches per call, ea_model.py:224-241). For an
N-turn chat that is O(N²) prefill work. This session keeps the committed
context's target KV, draft KV and token buffer alive between turns and
prefills only the *delta*:

- `send(full_prompt_ids)` computes the longest common prefix between the
  new prompt and the stored committed context, rewinds to it, and runs
  `EagleEngine._extend` over just `prompt[prefix-1:]` (one overlap row — see
  `_extend`'s docstring for why the boundary row is recomputed). A fresh
  chat (no common prefix) falls back to the standard full prefill.
- Rewind is free: `_extend(start=p-1)` overwrites stale rows past the
  prefix, so edited histories and host-side EOS trimming (device state can
  commit past the host's trim point) both resume correctly.
- Greedy outputs are bit-identical to a from-scratch `generate` over the
  same full context (tests/test_session.py) — incremental rows see exactly
  the same tokens, positions and causal extents as a monolithic prefill.
  Sampled turns draw fresh randomness per turn (the trajectory so far is
  committed text — the same Markov contract as paged preemption-resume).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _common_prefix(a: np.ndarray, b: np.ndarray) -> int:
    n = min(len(a), len(b))
    if n == 0:
        return 0
    neq = np.nonzero(a[:n] != b[:n])[0]
    return int(neq[0]) if len(neq) else n


class EagleSession:
    """One conversation's worth of engine state. Not thread-safe — callers
    serialize turns (the web backend holds its generation lock)."""

    def __init__(self, engine, seed: int = 0):
        self.engine = engine
        self._seed = seed
        self._turn = 0
        self._state = None
        self._ctx = np.zeros((0,), np.int32)

    @property
    def context(self) -> np.ndarray:
        """Committed tokens (prompt + replies) as of the last turn."""
        return self._ctx.copy()

    def reset(self):
        self._state = None
        self._ctx = np.zeros((0,), np.int32)

    # ------------------------------------------------------------------

    def _prepare(self, ids: np.ndarray, temperature: Optional[float]
                 ) -> Tuple[object, int]:
        """Prefill (full or incremental) for this turn's context `ids`.
        Returns (state, reused_prefix_len)."""
        eng = self.engine
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed), self._turn)
        self._turn += 1
        p = _common_prefix(ids, self._ctx) if self._state is not None else 0
        S = eng._tgt_len()
        if p >= 1 and (p - 1) + eng._bucket(len(ids) - (p - 1)) > S:
            # the extension window (resume row + bucketed delta) would
            # overflow the cache even though the context itself fits —
            # possible when max_len isn't ~a multiple of the 128-token
            # bucket quantum. A full bucketed prefill of the same ids
            # always fits (stream() guards len(ids) < max_len), so fall
            # back to it instead of failing the turn.
            p = 0
        if p >= 1:
            start = p - 1
            m = len(ids) - start
            Te = eng._bucket(m)
            padded = np.zeros((1, Te), np.int32)
            padded[0, :m] = ids[start:]
            fn = eng._extend_jit.get(Te)
            if fn is None:
                fn = jax.jit(eng._extend, donate_argnums=(5,))
                eng._extend_jit[Te] = fn
            state = fn(eng.params, eng.dparams, jnp.asarray(padded),
                       jnp.int32(m), jnp.int32(start), self._state, key,
                       eng._temp(temperature))
            reused = start
        else:
            Tp = eng._bucket(len(ids))
            padded = np.zeros((1, Tp), np.int32)
            padded[0, :len(ids)] = ids
            cache, dcache = eng.init_caches()
            fn = eng._prefill_jit.get(Tp)
            if fn is None:
                fn = jax.jit(eng._prefill, donate_argnums=(4, 5))
                eng._prefill_jit[Tp] = fn
            state = fn(eng.params, eng.dparams, jnp.asarray(padded),
                       jnp.int32(len(ids)), cache, dcache, key,
                       eng._temp(temperature))
            reused = 0
        self._state = state
        return state, reused

    def stream(self, prompt_ids, max_new_tokens: int = 512,
               eos_token_id: Optional[int] = None,
               temperature: Optional[float] = None
               ) -> Iterator[Tuple[np.ndarray, dict]]:
        """Generate a reply to the FULL prompt `prompt_ids` (context +
        latest turn), yielding (all_ids_so_far, stats) per decode round —
        `generate_stream` semantics plus `reused_prefix` in stats."""
        eng = self.engine
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if len(ids) == 0:
            raise ValueError("empty prompt")
        if len(ids) + eng.path_len + 1 >= eng.ecfg.max_len:
            raise ValueError(
                f"context ({len(ids)} tokens) leaves no generation room "
                f"within max_len {eng.ecfg.max_len}")
        state, reused = self._prepare(ids, temperature)
        out = list(ids)
        new_tokens = rounds = 0
        while new_tokens < max_new_tokens:
            state, r = eng._round_jit(eng.params, eng.dparams, state)
            self._state = state
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
            self._ctx = np.asarray(out, np.int32)
            yield np.asarray(out), {"new_tokens": new_tokens,
                                    "rounds": rounds, "accept_len": alen,
                                    "reused_prefix": reused}
            if stop or len(out) + eng.path_len + 1 >= eng.ecfg.max_len:
                break
        self._ctx = np.asarray(out, np.int32)

    def send(self, prompt_ids, max_new_tokens: int = 512,
             eos_token_id: Optional[int] = None,
             temperature: Optional[float] = None, log: bool = False):
        """Non-streaming turn: returns the full ids (context + reply);
        with log=True also the last round stats."""
        stats = {"new_tokens": 0, "rounds": 0, "reused_prefix": 0}
        for _, stats in self.stream(prompt_ids, max_new_tokens,
                                    eos_token_id, temperature):
            pass
        if log:
            return self.context, stats
        return self.context
