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


def test_paged_pool_too_small_rejects_at_submit():
    """A request the pool can never serve fails fast at submit() with a
    sizing error instead of head-of-line-blocking admission and aborting
    the serve loop later."""
    eng = make_engine(1)
    srv = PagedEagleServer(eng, max_batch=1, page_size=16, num_pages=2)
    with pytest.raises(ValueError, match="pages"):
        srv.submit(PROMPTS[0], 40)
    # a request that fits the pool end to end is still accepted
    srv2 = PagedEagleServer(eng, max_batch=1, page_size=16, num_pages=17)
    srv2.submit(PROMPTS[0], 40)
    srv2.run()


def test_preemption_preserves_arrival_order():
    """A preempted-and-resumed request keeps its ORIGINAL admit_seq, so the
    next preemption victim is chosen by true arrival order — a resumee must
    not become 'youngest' again and thrash (vLLM's recompute contract)."""
    eng = make_engine(1)
    srv = PagedEagleServer(eng, max_batch=2, page_size=16, num_pages=17)
    ra = srv.submit(PROMPTS[0], 140)
    rb = srv.submit(PROMPTS[1], 140)
    srv.step()  # admits both
    by_rid = {s.request_id: s for grp in srv.slots for s in grp if s.active}
    assert set(by_rid) == {ra, rb}
    seq_b = by_rid[rb].admit_seq
    assert by_rid[ra].admit_seq < seq_b
    ga, ia = next((g, i) for g in range(srv.G)
                  for i, s in enumerate(srv.slots[g]) if s.request_id == ra)
    assert srv._preempt_one(protect=(ga, ia))  # evicts rb (youngest)
    assert srv.queue[0].request_id == rb
    assert srv.queue[0].admit_seq == seq_b  # preserved on the requeue
    srv.step()  # readmits rb
    by_rid = {s.request_id: s for grp in srv.slots for s in grp if s.active}
    assert by_rid[rb].admit_seq == seq_b  # and on the re-bound slot
    outs = srv.run()
    singles = [eng.generate(p, max_new_tokens=140) for p in PROMPTS[:2]]
    for rid, ref in zip([ra, rb], singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_page_size_must_divide_bucket_quantum():
    eng = make_engine(1)
    with pytest.raises(ValueError, match="page_size"):
        PagedEagleServer(eng, max_batch=2, page_size=24)  # 128 % 24 != 0


def test_paged_int4_target_matches_singles():
    """Paged serving over a STACKED int4 target (the quantized serving
    point behind PagedEagleServer): outputs bit-identical to the same
    engine's single-request generate."""
    from eagle_tpu.ops import quant4

    eng0 = make_engine(3)
    qparams = quant4.quantize_target_params4(eng0.params)
    from eagle_tpu.engine.engine import EagleEngine
    eng = EagleEngine(qparams, eng0.cfg, eng0.dparams, eng0.dcfg, eng0.ecfg)
    budgets = [18, 14]
    singles = [eng.generate(p, max_new_tokens=b)
               for p, b in zip(PROMPTS[:2], budgets)]
    srv = PagedEagleServer(eng, max_batch=2, page_size=16)
    rids = [srv.submit(p, b) for p, b in zip(PROMPTS[:2], budgets)]
    outs = srv.run()
    for rid, ref in zip(rids, singles):
        np.testing.assert_array_equal(outs[rid], ref)
