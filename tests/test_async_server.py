"""Async (one-step-lookahead) scheduling: the server dispatches round N+1
before draining round N, so the device computes through the host's
drain + token processing + admission (vLLM's async scheduler). Outputs
must stay bit-identical to sync scheduling and to single-request
generation — stale results from rebound slots (finish-refill, preemption)
are dropped by bind_id, never credited."""

import numpy as np

from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.paged import PagedEagleServer
from eagle_tpu.engine.server import EagleServer

from test_engine_greedy import make_engine

PROMPTS = [
    np.array([5, 17, 92, 3], np.int32),
    np.array([7, 1], np.int32),
    np.array([44, 8, 21, 9], np.int32),
    np.array([2, 9, 6], np.int32),
]


import pytest


@pytest.mark.parametrize("depth", [1, 4])
def test_async_staggered_bit_exact(depth):
    """4 requests through 2 slots with mid-flight joins: async scheduling
    reproduces single-request greedy outputs exactly (slot refills after a
    finish run up to `depth` wasted rounds whose results must be
    dropped)."""
    eng = make_engine(1)
    budgets = [18, 25, 11, 21]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS, budgets)]
    srv = EagleServer(eng, max_batch=2, async_schedule=depth)
    r0 = srv.submit(PROMPTS[0], budgets[0])
    r1 = srv.submit(PROMPTS[1], budgets[1])
    srv.step()
    srv.step()
    r2 = srv.submit(PROMPTS[2], budgets[2])
    srv.step()
    r3 = srv.submit(PROMPTS[3], budgets[3])
    outs = srv.run()
    assert set(outs) == {r0, r1, r2, r3}
    for rid, ref in zip([r0, r1, r2, r3], singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_async_eos_and_streaming():
    """EOS finish + streaming: the union of per-step emissions equals the
    completion (results surface one step later, but nothing is lost or
    duplicated)."""
    eng0 = make_engine(1)
    p = PROMPTS[0]
    ref = eng0.generate_vanilla(p, max_new_tokens=30)
    eos = int(ref[len(p) + 8])
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                      eng0.ecfg, eos_token_id=eos)
    srv = EagleServer(eng, max_batch=2, async_schedule=True)
    rid = srv.submit(p, 30)
    streamed = []
    for _ in range(200):
        got = srv.step()
        if rid in got:
            streamed.extend(got[rid])
        if rid in srv.finished and srv._idle():
            break
    exp = eng0.generate_vanilla(p, max_new_tokens=30, eos_token_id=eos)
    np.testing.assert_array_equal(srv.finished[rid], exp)
    np.testing.assert_array_equal(
        np.asarray(streamed), srv.finished[rid][len(p):])


def test_async_matches_sync_with_buckets_and_groups():
    """Async vs sync under kv_buckets + 2 groups: identical outputs. The
    async bucket margin (+path_len for bookkeeping lag) must never change
    tokens, only bucket sizing."""
    eng = make_engine(3, kv_buckets=(64, 128))
    budgets = [30, 24, 36, 20]
    sync = EagleServer(eng, max_batch=4, groups=2)
    rs = [sync.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    ref = sync.run()
    asy = EagleServer(eng, max_batch=4, groups=2, async_schedule=2)
    ra = [asy.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    got = asy.run()
    for s, a in zip(rs, ra):
        np.testing.assert_array_equal(got[a], ref[s])


def test_async_paged_staggered_bit_exact():
    """Paged pool + async scheduling: page growth for the in-flight round
    is pre-sized by the lag margin; outputs bit-exact vs single-request."""
    eng = make_engine(1)
    budgets = [18, 25, 11, 21]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS, budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16,
                           async_schedule=True)
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_async_paged_preemption_resume_bit_exact():
    """Preemption with a round in flight: the victim's stale round result
    must be dropped (not appended to its resume context), and the freed
    pages — rewritten by the in-flight scatter AFTER release — must still
    hand the new owner clean data (device dispatch order: the new owner's
    prefill lands last)."""
    eng = make_engine(1)
    budgets = [140, 140]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS[:2], budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, num_pages=17,
                           async_schedule=True)
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS[:2], budgets)]
    outs = srv.run()
    assert srv.preemptions >= 1
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_async_chunked_prefill_bit_exact():
    """Chunked prefill + async rounds interleave; outputs unchanged."""
    rng = np.random.default_rng(7)
    long_p = rng.integers(1, 128, size=90).astype(np.int32)
    eng = make_engine(1)
    prompts = [PROMPTS[0], long_p]
    budgets = [20, 16]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, prefill_chunk=32,
                           async_schedule=True)
    rids = [srv.submit(p, b) for p, b in zip(prompts, budgets)]
    outs = srv.run()
    assert srv.chunked_prefills == 1
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_async_sampled_matches_sync():
    """Sampled mode (per-request temperature + seed): async == sync, token
    for token — the PRNG stream is per-slot state, untouched by stale
    rounds of OTHER bindings."""
    eng = make_engine(1, temperature=0.8)
    budgets = [15, 19, 12]
    sync = EagleServer(eng, max_batch=2)
    rs = [sync.submit(p, b, seed=i + 1, temperature=0.5 + 0.3 * i)
          for i, (p, b) in enumerate(zip(PROMPTS[:3], budgets))]
    ref = sync.run()
    asy = EagleServer(eng, max_batch=2, async_schedule=True)
    ra = [asy.submit(p, b, seed=i + 1, temperature=0.5 + 0.3 * i)
          for i, (p, b) in enumerate(zip(PROMPTS[:3], budgets))]
    got = asy.run()
    for s, a in zip(rs, ra):
        np.testing.assert_array_equal(got[a], ref[s])
