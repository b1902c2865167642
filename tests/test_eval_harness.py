"""Evaluation harness test: run a tiny engine over a few real MT-bench
questions with a toy byte-level tokenizer; jsonl fields and summary must be
consistent with the reference's methodology (τ = Σnew_tokens/Σidxs)."""

import json
import os

import numpy as np

from eagle_tpu.evaluation import harness

from test_engine_greedy import make_engine

DATA = os.path.join(os.path.dirname(__file__), "..", "eagle_tpu", "data",
                    "mt_bench", "question.jsonl")


def _encode(s):
    return np.frombuffer(s.encode()[:48], dtype=np.uint8).astype(np.int32) % 128


def _decode(ids):
    return bytes(int(i) % 128 for i in ids).decode(errors="replace")


def test_harness_end_to_end(tmp_path):
    eng = make_engine(1)
    questions = harness.load_questions(DATA, 0, 2)
    assert len(questions) == 2 and "turns" in questions[0]

    out_e = str(tmp_path / "eagle.jsonl")
    out_b = str(tmp_path / "base.jsonl")
    recs_e = harness.run_benchmark(
        harness.make_generate_fn(eng, "eagle"), _encode, _decode, questions,
        out_e, max_new_tokens=24, num_warmup=1)
    recs_b = harness.run_benchmark(
        harness.make_generate_fn(eng, "baseline"), _encode, _decode, questions,
        out_b, max_new_tokens=24, num_warmup=0)

    # jsonl round-trips
    loaded = [json.loads(l) for l in open(out_e)]
    assert len(loaded) == 2
    c = loaded[0]["choices"][0]
    assert len(c["turns"]) == len(c["wall_time"]) == len(c["new_tokens"]) \
        == len(c["idxs"]) == 2

    s_e = harness.summarize(recs_e)
    s_b = harness.summarize(recs_b)
    assert s_e["tau"] >= 1.0
    assert abs(s_b["tau"] - 1.0) < 1e-9  # baseline: one token per forward
    assert s_e["total_new_tokens"] == sum(sum(r["choices"][0]["new_tokens"])
                                          for r in recs_e)
    assert 0.0 <= s_e["alpha_per_depth"][0] <= 1.0

    ratio = harness.speed_ratio(out_e, out_b)
    assert ratio > 0


def test_sharding_splits_questions():
    qs = [{"question_id": i, "turns": ["x"]} for i in range(10)]
    got = []
    for shard in range(3):
        sub = list(qs)[shard::3]
        got += [q["question_id"] for q in sub]
    assert sorted(got) == list(range(10))


def test_harness_fused_mode(tmp_path):
    """fused=True (single-dispatch generation): same answers and τ as the
    host-loop paths — only accept_lens detail is absent."""
    eng = make_engine(1)
    questions = harness.load_questions(DATA, 0, 1)
    out_h = str(tmp_path / "host.jsonl")
    out_f = str(tmp_path / "fused.jsonl")
    recs_h = harness.run_benchmark(
        harness.make_generate_fn(eng, "eagle"), _encode, _decode,
        questions, out_h, max_new_tokens=24, num_warmup=0)
    recs_f = harness.run_benchmark(
        harness.make_generate_fn(eng, "eagle", fused=True), _encode,
        _decode, questions, out_f, max_new_tokens=24, num_warmup=0)
    ch, cf = recs_h[0]["choices"][0], recs_f[0]["choices"][0]
    assert cf["turns"] == ch["turns"]          # greedy: identical text
    assert cf["new_tokens"] == ch["new_tokens"]
    assert cf["idxs"] == ch["idxs"]            # same round counts
    assert all(not a for a in cf.get("accept_lens", []))
    # fused baseline runs too
    recs_b = harness.run_benchmark(
        harness.make_generate_fn(eng, "baseline", fused=True), _encode,
        _decode, questions, str(tmp_path / "bf.jsonl"),
        max_new_tokens=24, num_warmup=0)
    assert harness.summarize(recs_b)["tau"] == 1.0
