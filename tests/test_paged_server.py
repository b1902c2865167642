"""Paged-KV continuous batching: the shared page pool + block-table server
must reproduce dense-server / single-request greedy outputs bit-exactly —
including across page growth, slot recycling, and preemption-resume — while
actually bounding KV memory by the pool, not batch × max_len."""

import numpy as np
import pytest

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


def test_paged_staggered_bit_exact():
    """Mixed lengths + staggered joins through a paged pool reproduce
    single-request greedy outputs (== generate_vanilla) bit-exactly."""
    eng = make_engine(1)
    budgets = [18, 25, 11, 21]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS, budgets)]

    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
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
    assert srv.preemptions == 0


def test_paged_matches_dense_server_under_buckets():
    """Paged vs dense server, same engine with kv_buckets configured —
    identical outputs; page growth crosses several page boundaries."""
    eng = make_engine(3, kv_buckets=(64, 128))
    budgets = [30, 24, 36, 20]
    dense = EagleServer(eng, max_batch=2)
    rids = [dense.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    ref = dense.run()

    paged = PagedEagleServer(eng, max_batch=2, page_size=16)
    rids_p = [paged.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    got = paged.run()
    for rd, rp in zip(rids, rids_p):
        np.testing.assert_array_equal(got[rp], ref[rd])


def test_paged_pool_smaller_than_dense_capacity():
    """The capacity lift: a pool far smaller than batch × max_len still
    serves every request (queuing on pages instead of OOM). Dense equivalent
    per slot here would be pages_per_slot pages; give the pool ~1.3 slots'
    worth and run 4 requests through 4 slots."""
    eng = make_engine(1)
    srv_probe = PagedEagleServer(eng, max_batch=4, page_size=16)
    budgets = [14, 19, 9, 16]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS, budgets)]

    # 20 usable pages; each prompt bucket takes 8 — only two requests fit at
    # once, the rest queue on page availability instead of failing
    srv = PagedEagleServer(eng, max_batch=4, page_size=16, num_pages=21)
    assert srv.pool_bytes < srv_probe.pool_bytes // 2
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS, budgets)]
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_paged_preemption_resume_bit_exact():
    """Force growth-driven preemption (tiny pool, two long generations) and
    check the evicted request's resumed output is still bit-identical:
    greedy decoding is Markov in committed tokens, so prefill-resume loses
    nothing."""
    eng = make_engine(1)
    budgets = [140, 140]  # committed length crosses the 128-row prompt
    # bucket, forcing page growth mid-generation
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS[:2], budgets)]

    # both prompts admit (8 pages each), but the pool has no spare page for
    # growth — the first grower must evict the younger request
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, num_pages=17)
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS[:2], budgets)]
    outs = srv.run()
    assert srv.preemptions >= 1
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_paged_pool_too_small_raises():
    eng = make_engine(1)
    srv = PagedEagleServer(eng, max_batch=1, page_size=16, num_pages=2)
    srv.submit(PROMPTS[0], 40)
    with pytest.raises(RuntimeError, match="pool"):
        srv.run()


def test_page_size_must_divide_bucket_quantum():
    eng = make_engine(1)
    with pytest.raises(ValueError, match="page_size"):
        PagedEagleServer(eng, max_batch=2, page_size=24)  # 128 % 24 != 0
