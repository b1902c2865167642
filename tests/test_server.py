"""Continuous-batching server: staggered request admission must reproduce
single-request outputs bit-exactly (greedy), with slot reuse."""

import numpy as np

from eagle_tpu.engine.engine import EagleEngine
from eagle_tpu.engine.server import EagleServer

from test_engine_greedy import make_engine


def _mk(eos=None):
    eng0 = make_engine(1)
    if eos is None:
        return eng0, eng0
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                      eng0.ecfg, eos_token_id=eos)
    return eng0, eng


def test_server_staggered_admission_bit_exact():
    eng0, _ = _mk()
    prompts = [
        np.array([5, 17, 92, 3], np.int32),
        np.array([7, 1], np.int32),
        np.array([44, 8, 21, 9], np.int32),
        np.array([2, 9, 6], np.int32),
    ]
    budgets = [18, 25, 11, 21]
    singles = [eng0.generate(p, max_new_tokens=b)
               for p, b in zip(prompts, budgets)]

    srv = EagleServer(eng0, max_batch=2)  # 4 requests through 2 slots
    r0 = srv.submit(prompts[0], budgets[0])
    r1 = srv.submit(prompts[1], budgets[1])
    srv.step()
    srv.step()
    r2 = srv.submit(prompts[2], budgets[2])  # queued mid-flight
    srv.step()
    r3 = srv.submit(prompts[3], budgets[3])
    outs = srv.run()
    assert set(outs) == {r0, r1, r2, r3}
    for rid, ref in zip([r0, r1, r2, r3], singles):
        np.testing.assert_array_equal(outs[rid], ref)


def test_server_eos_and_streaming():
    eng0 = make_engine(1)
    p = np.array([5, 17, 92, 3], np.int32)
    ref = eng0.generate_vanilla(p, max_new_tokens=30)
    eos = int(ref[len(p) + 8])
    _, eng = _mk(eos)
    srv = EagleServer(eng, max_batch=2)
    rid = srv.submit(p, 30)
    streamed = []
    while rid not in srv.finished:
        got = srv.step()
        if rid in got:
            streamed.extend(got[rid])
    exp = eng0.generate_vanilla(p, max_new_tokens=30, eos_token_id=eos)
    np.testing.assert_array_equal(srv.finished[rid], exp)
    # streamed tokens = completion portion of the final output
    np.testing.assert_array_equal(
        np.asarray(streamed), srv.finished[rid][len(p):])


def test_server_with_kv_buckets_bit_exact():
    from eagle_tpu.config import EngineConfig

    eng0 = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([7, 1], np.int32)]
    refs = [eng0.generate(p, max_new_tokens=22) for p in prompts]

    ecfg_b = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          kv_buckets=(64, 128))
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_b)
    srv = EagleServer(eng, max_batch=2)
    rids = [srv.submit(p, 22) for p in prompts]
    outs = srv.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(outs[rid], ref)


def test_server_grouped_buckets_bit_exact():
    """groups=2 with mixed-length requests: outputs stay bit-exact and the
    long-context request does not de-bucket the short group."""
    from eagle_tpu.config import EngineConfig

    eng0 = make_engine(1)
    rng = np.random.default_rng(0)
    short = [np.array([5, 17, 92], np.int32),
             np.array([7, 1], np.int32)]
    long = [rng.integers(0, 128, size=(150,)).astype(np.int32)]
    refs = [eng0.generate(p, max_new_tokens=14) for p in short + long]

    ecfg_b = EngineConfig(total_tokens=15, depth=3, top_k=4, max_len=256,
                          kv_buckets=(64, 128))
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg, ecfg_b)
    srv = EagleServer(eng, max_batch=4, groups=2)
    rids = [srv.submit(p, 14) for p in short + long]
    srv.step()
    # the scheduler must have separated short and long into different groups
    by_group = [
        {s.request_id for s in grp if s.active} for grp in srv.slots]
    g_long = next(g for g, ids in enumerate(by_group) if rids[2] in ids)
    g_short = next(g for g, ids in enumerate(by_group) if rids[0] in ids)
    assert g_long != g_short
    assert srv._group_bucket(g_short) < srv._group_bucket(g_long)
    outs = srv.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(outs[rid], ref)


def test_server_admission_pacing():
    """max_admit_per_step caps prefill dispatches per scheduler step; the
    remaining requests stay queued (no burst stall) and still finish
    bit-exact."""
    eng0 = make_engine(1)
    prompts = [np.array([i + 1, 9, 3], np.int32) for i in range(4)]
    refs = [eng0.generate(p, max_new_tokens=10) for p in prompts]
    srv = EagleServer(eng0, max_batch=4, max_admit_per_step=1)
    rids = [srv.submit(p, 10) for p in prompts]
    srv.step()
    assert sum(s.active for grp in srv.slots for s in grp) == 1
    assert len(srv.queue) == 3
    srv.step()
    assert sum(s.active for grp in srv.slots for s in grp) == 2
    outs = srv.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(outs[rid], ref)


def test_server_rejects_temperature_on_greedy_engine():
    """A greedy engine's compiled program never reads the traced
    temperature — submit() must refuse instead of silently returning
    argmax output."""
    eng, _ = _mk()
    srv = EagleServer(eng, max_batch=2)
    with np.testing.assert_raises(ValueError):
        srv.submit(np.array([5, 17, 92], np.int32), max_new_tokens=8,
                   temperature=0.7)


def test_server_serving_tree_bit_exact():
    """A serving-calibrated (smaller) tree changes throughput only: the
    server built with a tree override still reproduces single-request
    greedy outputs bit-exactly (which equal generate_vanilla)."""
    eng0 = make_engine(1)
    prompts = [np.array([5, 17, 92, 3], np.int32),
               np.array([7, 1], np.int32),
               np.array([44, 8, 21, 9], np.int32)]
    refs = [eng0.generate_vanilla(p, max_new_tokens=16) for p in prompts]

    srv = EagleServer(eng0, max_batch=2, total_tokens=7, depth=2, top_k=3)
    assert srv.engine is not eng0
    assert srv.engine.ecfg.tree_size == 8
    assert srv.engine.params is eng0.params  # sibling shares params
    rids = [srv.submit(p, 16) for p in prompts]
    outs = srv.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(outs[rid], ref)


def test_server_auto_calibrated_tree():
    """total_tokens=-1 runs calibrate_total_tokens at serving batch size
    (the from_pretrained convention); outputs stay bit-exact."""
    eng0 = make_engine(1)
    p = np.array([5, 17, 92, 3], np.int32)
    ref = eng0.generate_vanilla(p, max_new_tokens=12)
    srv = EagleServer(eng0, max_batch=2, total_tokens=-1)
    assert srv.engine.ecfg.total_tokens in (40, 48, 50, 56, 60)
    rid = srv.submit(p, 12)
    np.testing.assert_array_equal(srv.run()[rid], ref)


def test_with_tree_sibling_semantics():
    """with_tree: params-sharing sibling, greedy output invariant to tree
    size; no-op without changes; refuses static topologies."""
    from eagle_tpu.ops.tree import CHAIN_5

    eng = make_engine(3)
    p = np.array([5, 17, 92, 3], np.int32)
    ref = eng.generate_vanilla(p, max_new_tokens=20)
    small = eng.with_tree(total_tokens=5, depth=2, top_k=2)
    assert small.dparams is eng.dparams
    np.testing.assert_array_equal(small.generate(p, max_new_tokens=20), ref)
    assert eng.with_tree() is eng
    static = make_engine(1, tree_paths=CHAIN_5)
    with np.testing.assert_raises(ValueError):
        static.with_tree(total_tokens=5)
