"""End-to-end speculative-decoding benchmark on real TPU hardware.

Measures wall-clock speedup of the EAGLE engine over vanilla autoregressive
decoding — the reference's headline metric (speed-ratio methodology:
/root/reference/eagle/evaluation/speed.py:16-50) — plus the numbers that
make the ratio auditable: absolute tokens/s, bandwidth/FLOP utilization vs
the v5e roofline, and speedup MEASURED at several draft qualities (a
τ-sweep), so the headline does not rest on a single acceptance point.

Target: a ~4B-parameter llama-class model (head_dim=128 — the Pallas
compaction kernel's native case), the largest that fits v5e-1 HBM next to
the draft + distillation state. No public checkpoints are reachable here
(zero egress), so weights are random and the draft head is distilled
on-device against the target's own greedy trajectories (the EAGLE-3 TTT
objective). Snapshots of the draft at increasing distillation depth give
genuinely *measured* (τ, speedup) points rather than one extrapolated curve.

Methodology invariants (do not "simplify" these):
- τ is measured in FORCED-REPLAY mode (engine.generate_fused(force_tokens=
  corpus_row) — the engine-level analog of the reference's teacher-forced
  getkacc rollouts, train/main.py:240-293): acceptance is pinned to the
  corpus trajectory while every timed component (draft beam steps, tree
  verify forward, acceptance walk, KV compaction) runs unchanged. Why: a
  RANDOM-weight target has ulp-scale argmax margins, so on-TPU bf16 its
  free-running greedy trajectory is chaotic — any change in round
  boundaries regroups attention reductions and flips an argmax within ~50
  tokens, knocking the measurement off the draft's training distribution
  and collapsing τ to ~1 (an emulation artifact: real trained targets have
  real margins; the engine's own live-argmax agreement per run is reported
  as `live_agreement`). The TRAINED draft has real margins, so its side of
  the measurement is ulp-robust. The free-running τ is also measured and
  reported (`tau_free`) for honesty.
- The corpus is the target's own fused-vanilla greedy trajectory — exactly
  the token stream production speculative decoding must reproduce.
- Both decode paths are fully device-side (one dispatch per generation):
  vanilla = lax.scan over single-token steps; EAGLE = lax.while_loop over
  rounds. Timing uses the SLOPE between two generation budgets
  (Δtime/Δtokens), cancelling the ~90ms fixed per-dispatch cost of the
  remote-TPU tunnel.

- The draft is distilled on TRAIN_ROWS of the corpus only; `tau_heldout` is
  measured on the held-out rows. A RANDOM-weight target's trajectories
  share no structure across prompts (there is no language to learn), so an
  emulation draft can only memorize — tau_heldout ≈ 1 is the expected
  result and is reported as the *disclosure* that the training-row τ is a
  memorization ceiling. That is exactly why the transferable claim is the
  `speedup_at_tau` curve: round time is τ-independent (fixed shapes), so
  speedup(τ) = τ·1e3/round_ms/vanilla_tps, anchored by the measured sweep
  points; real EAGLE-3 checkpoints land at τ≈4–6 (reference's published
  numbers).

Prints exactly ONE JSON line on stdout; the headline fields are
{"metric", "value", "unit", "vs_baseline"} (vs_baseline = speedup / 3.0,
the BASELINE.md north star). "value" is the best LOSSLESS operating point
— bf16, int8+QAT, or int4+QAT draft (Pallas w4a8 kernel), whichever
measures fastest ("headline" names it; all emit bit-exact greedy output
against the same vanilla baseline, so the comparison is exact). NOTE:
"value" is a MEMORIZATION-CEILING point for this random-weight emulation
(the draft can only memorize its training rows — see above); the
transferable number is "speedup_at_tau5" (τ=5, the published EAGLE-3
range, at the measured headline round time), carried alongside "value" in
the headline block. Extra keys carry the full set: absolute tok/s, MBU/MFU
(decode round AND prefill), the (τ, speedup) sweep, held-out τ, kernel A/B
round times, and batched-serving aggregate throughput at B ∈ {1, 4, 8}
(forced replay per sequence, headline engine), including a
serving-calibrated-tree A/B at B=8 ("serving_tree_b8": the batched round
is verify-compute-bound, so smaller trees trade τ for round time;
serving["8"] reports the measured-best point on that frontier).

Wall-clock discipline (the driver kills the bench at its own timeout; a
record with no JSON line is worthless — BENCH_r03 lesson):
- A hard stage budget (BENCH_BUDGET_S, default 1500 s) gates every
  optional stage; the JSON line prints with whatever stages fit, each
  skipped stage logged. Stage order = evidentiary priority: vanilla +
  bf16 headline + one QAT candidate first, sweeps/A-Bs/serving after.
- Distilled drafts and the corpus are content-cached in .bench_cache/
  (keyed by config + corpus digest; the corpus is revalidated against a
  freshly regenerated trajectory row each run, so numerics drift in the
  vanilla path invalidates the cache instead of silently measuring a
  stale draft). A warm run skips all distillation (~500 s).
- QAT candidates warm-start from the 200-step bf16 snapshot and
  fine-tune BENCH_QAT_STEPS (default 60) quantization-aware steps —
  recovering the τ that post-training quantization loses at ~1/4 the
  cost of the from-scratch QAT distills that blew the r3 budget.
"""

import dataclasses
import json
import os
import sys
import time

# Some host VMs demand-fault fresh anonymous pages at ~6 MB/s (single
# thread) — a few GB of host snapshots would add many minutes. Re-exec once
# with glibc tuned to keep freed pages resident (no mmap/munmap churn), so
# only the FIRST allocation of the working set pays the fault-in, and that
# payment is made up front by a 4-thread pre-fault (~4x the single-thread
# rate). On a healthy VM both are near-free.
if os.environ.get("MALLOC_MMAP_MAX_") != "0":
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, MALLOC_MMAP_MAX_="0",
                   MALLOC_TRIM_THRESHOLD_="-1"))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("BENCH_TINY"):
    # logic smoke test: stay off the TPU (the environment's sitecustomize
    # pins the remote plugin regardless of JAX_PLATFORMS)
    jax.config.update("jax_platforms", "cpu")


def prefault_host_arena(gb: float = 4.0, threads: int = 4):
    """Touch `gb` of heap once (in parallel) so later numpy allocations of
    the bench's host working set (distill recovery snapshots, sweep
    re-uploads) reuse resident pages at memory speed."""
    import threading as th
    n = int(gb * 1e9 / 4 / threads)
    bufs = [np.empty(n, np.float32) for _ in range(threads)]
    ts = [th.Thread(target=b.fill, args=(0.0,)) for b in bufs]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    del bufs

# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
PEAK_FLOPS = 197e12
PEAK_BW = 819e9

LO, HI = 16, 112         # slope budgets (forced replay never de-trains τ)
DISTILL_SNAPSHOTS = (12, 40, 200)  # steps → increasing draft quality / τ
TRAIN_ROWS = 12          # corpus rows used for distillation; the rest are
                         # held out → tau_heldout measures a GENERALIZING
                         # draft (no memorization), the realistic-τ point
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
QAT_STEPS = int(os.environ.get("BENCH_QAT_STEPS", "60"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
if os.environ.get("BENCH_TINY"):
    DISTILL_SNAPSHOTS = (2, 5)
    QAT_STEPS = 3


def _save_tree(path, tree, meta=None):
    """Persist a pytree of arrays (bf16 stored as uint16 views) + JSON meta
    atomically. Used for the distilled-draft cache: a warm bench run skips
    every distillation (the r3 budget killer)."""
    import ml_dtypes
    payload, dts = {}, []
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        a = np.asarray(leaf)
        dts.append(str(a.dtype))
        if a.dtype == ml_dtypes.bfloat16:
            a = a.view(np.uint16)
        payload[f"a{i}"] = a
    payload["dtypes"] = np.array(dts)
    payload["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), np.uint8).copy()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _load_tree(path, template):
    """Load a pytree saved by _save_tree, validated leaf-by-leaf against
    `template` (a jax.eval_shape pytree). Returns (tree, meta) or
    (None, None) on miss/mismatch — a shape drift is a cache invalidation,
    never an error."""
    import ml_dtypes
    if not os.path.exists(path):
        return None, None
    try:
        z = np.load(path)
        tleaves, tdef = jax.tree.flatten(template)
        dts = [str(s) for s in z["dtypes"]]
        if len(dts) != len(tleaves):
            return None, None
        leaves = []
        for i, (sd, dt) in enumerate(zip(tleaves, dts)):
            a = z[f"a{i}"]
            if dt == "bfloat16":
                a = a.view(ml_dtypes.bfloat16)
            if tuple(a.shape) != tuple(sd.shape) or str(sd.dtype) != dt:
                return None, None
            leaves.append(a)
        meta = json.loads(bytes(z["meta"]).decode())
        return jax.tree.unflatten(tdef, leaves), meta
    except Exception as e:  # corrupt file == miss
        log(f"[bench] cache load failed {path}: {type(e).__name__}: {e}")
        return None, None


def retry_flake(fn, tries=3, wait=45):
    """The axon tunnel intermittently throws RESOURCE_EXHAUSTED /
    FAILED_PRECONDITION on programs that fit comfortably; retry those."""
    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError
            name = type(e).__name__
            transient = ("RESOURCE_EXHAUSTED" in str(e)
                         or "FAILED_PRECONDITION" in str(e)
                         # remote_compile HTTP 500: the tunnel's compile
                         # helper subprocess dies under memory pressure
                         # and recovers (r5: the kv_int8_b8 stage failed
                         # in-run but reproduced cleanly standalone)
                         or "remote_compile: HTTP 5" in str(e))
            if not transient or i == tries - 1:
                raise
            log(f"[bench] transient {name}; retrying in {wait}s "
                f"({i + 1}/{tries - 1})")
            time.sleep(wait)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def timed(fn, n=3):
    fn()  # compile / warm
    best = float("inf")
    r = None
    for _ in range(n):
        t = time.time()
        r = fn()
        best = min(best, time.time() - t)
    return best, r


def main():
    from eagle_tpu.config import (DraftConfig, EngineConfig, ModelConfig,
                                  RopeConfig)
    from eagle_tpu.engine.engine import EagleEngine
    from eagle_tpu.models import draft as draft_mod
    from eagle_tpu.models import transformer
    from eagle_tpu.train import ttt

    t0 = time.time()
    if not os.environ.get("BENCH_TINY"):
        prefault_host_arena()
        log(f"[bench] host arena pre-faulted in {time.time()-t0:.1f}s")
    # ~4.07B params: H=3072, 28 layers, FFN 12288, 24q/8kv heads, d=128
    H, L, F, NQ, NKV, D, V = 3072, 28, 12288, 24, 8, 128, 32000
    if os.environ.get("BENCH_TINY"):  # logic smoke test (CPU, seconds)
        H, L, F, NQ, NKV, D, V = 64, 2, 128, 4, 4, 16, 256
    cfg = ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=F, num_layers=L,
        num_q_heads=NQ, num_kv_heads=NKV, head_dim=D,
        rope=RopeConfig(theta=500000.0), dtype=jnp.bfloat16,
    )
    dcfg = DraftConfig(
        version=3, hidden_size=H, intermediate_size=F, num_q_heads=NQ,
        num_kv_heads=NKV, head_dim=D, vocab_size=V, target_hidden_size=H,
        dtype=jnp.bfloat16,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    # sharpen the head: a random net is near-uniform; real LLMs are peaked
    params["lm_head"] = params["lm_head"] * 8.0
    dparams0 = draft_mod.init_params(dcfg, jax.random.PRNGKey(1))
    dparams0["embed"]["w"] = params["embed"]["w"]
    target_bytes = tree_bytes(params)
    n_target_params = target_bytes // 2
    draft_bytes = tree_bytes(dparams0) - params["embed"]["w"].size * 2
    # compact_impl: the compaction A/B is NOISE-BOUND — consecutive r4
    # runs gave xla 16.32 vs pallas 17.49, then xla 17.68 vs pallas 16.60
    # (±1 ms tunnel variance swamps the ~0.1 ms r2/r3 deltas). Neither
    # impl consistently wins at these shapes; the bench pins "xla" so the
    # headline config is deterministic, and the A/B stage keeps recording
    # both sides of the noise envelope.
    ecfg = EngineConfig(total_tokens=63, depth=7, top_k=10, max_len=1024,
                        kv_buckets=(256, 512), compact_impl="xla")
    eng = EagleEngine(params, cfg, dparams0, dcfg, ecfg)
    log(f"[bench] setup {time.time()-t0:.1f}s; devices={jax.devices()}; "
        f"target {target_bytes/1e9:.2f} GB bf16 ({n_target_params/1e9:.2f}B "
        f"params), draft {draft_bytes/1e9:.2f} GB")

    # ---- corpus: the target's own greedy trajectories via the fused
    # vanilla scan — the token stream production speculative decoding must
    # reproduce. Forced-replay measurement (see module docstring) pins the
    # engine to these trajectories, so ONE corpus serves distillation and
    # every measurement.
    B, Lp, T_gen = 16, 16, 160
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, V, size=(B, Lp)).astype(np.int32)

    import hashlib
    cfg_key = hashlib.sha1(json.dumps(
        [H, L, F, NQ, NKV, D, V, B, Lp, T_gen, TRAIN_ROWS,
         list(DISTILL_SNAPSHOTS)]).encode()).hexdigest()[:12]
    corpus_path = os.path.join(CACHE_DIR, f"corpus_{cfg_key}.npz")

    def gen_row(i, budget=T_gen):
        return retry_flake(lambda: eng.generate_vanilla(
            prompts[i], max_new_tokens=budget, fused=True))[: Lp + budget]

    t2 = time.time()
    data = None
    if os.path.exists(corpus_path):
        cached = np.load(corpus_path)["data"]
        # staleness probe: any numerics drift in the vanilla decode path
        # (kernel/op changes since the cache was written) changes the
        # greedy trajectory — regenerate rather than measure a stale draft
        if (cached.shape == (B, Lp + T_gen)
                and np.array_equal(gen_row(0), cached[0])):
            data = cached
            log(f"[bench] corpus cache hit ({time.time()-t2:.1f}s probe)")
        else:
            log("[bench] corpus cache STALE (vanilla trajectory changed)")
    if data is None:
        data = np.stack([gen_row(i) for i in range(B)]).astype(np.int32)
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = corpus_path + ".tmp.npz"
        np.savez(tmp, data=data)
        os.replace(tmp, corpus_path)
        log(f"[bench] corpus {data.shape} {time.time()-t2:.1f}s")
    corpus_digest = hashlib.sha1(data.tobytes()).hexdigest()[:12]

    tcfg = ttt.TrainConfig(length=7, lr=3e-3, warmup_steps=10,
                           total_steps=2000)
    opt = ttt.make_optimizer(tcfg)
    # donate dparams+opt_state: in-place buffer reuse step-over-step. The
    # tunnel's server-side frees lag allocations, so the alloc/free churn
    # of a non-donated loop accumulates into RESOURCE_EXHAUSTED mid-run.
    step = jax.jit(lambda dp, os_, tp, b: ttt.train_step(
        dp, os_, tp, cfg, dcfg, tcfg, opt, b), donate_argnums=(0, 1))

    def distill(dparams, opt_state, rows, n_steps, step_fn=None):
        # alternate half-batches: halves the activation / logit-buffer peak
        # next to the 8.1GB resident target (every corpus sequence is still
        # seen — full-batch steps OOM when the tunnel's allocator is tight)
        step_fn = step_fn or step
        halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
        batches = [{
            "input_ids": jnp.asarray(h),
            "loss_mask": jnp.ones(h.shape, jnp.float32),
            "pad_mask": jnp.ones(h.shape, bool),
        } for h in halves]
        m = None
        for i in range(n_steps):
            dparams, opt_state, m = step_fn(dparams, opt_state, params,
                                            batches[i % 2])
            # bound the async dispatch queue to one in-flight step: each
            # queued step pins a full optimizer-state buffer set on the
            # device, and the tunnel enqueues far ahead of execution —
            # unbounded, that OOMs an otherwise comfortably-fitting run
            jax.block_until_ready(m.accs)
        return dparams, opt_state, m

    def distill_resilient(dparams, opt_state, data, n_steps, tries=3,
                          step_fn=None):
        """distill() with segment-level recovery: when the tunnel throws a
        transient RESOURCE_EXHAUSTED mid-segment (it does, under load — the
        program fits comfortably in healthy phases), rebuild the segment's
        input state from host snapshots and rerun it."""
        hp = jax.tree.map(np.asarray, dparams)
        ho = jax.tree.map(np.asarray, opt_state)
        for attempt in range(tries):
            try:
                if attempt:
                    dparams = jax.tree.map(jnp.asarray, hp)
                    opt_state = jax.tree.map(jnp.asarray, ho)
                return distill(dparams, opt_state, data, n_steps,
                               step_fn=step_fn)
            except Exception as e:
                transient = ("RESOURCE_EXHAUSTED" in str(e)
                             or "FAILED_PRECONDITION" in str(e))
                if not transient or attempt == tries - 1:
                    raise
                # drop device refs BEFORE re-uploading from host — holding
                # them would double residency during the retry upload
                dparams = opt_state = None
                log(f"[bench] transient {type(e).__name__} in distill; "
                    f"restarting segment in 120s ({attempt + 1}/{tries - 1})")
                time.sleep(120)

    t2 = time.time()
    dtempl = jax.eval_shape(
        lambda: draft_mod.init_params(dcfg, jax.random.PRNGKey(1)))

    def draft_cache_path(label):
        return os.path.join(CACHE_DIR,
                            f"draft_{label}_{corpus_digest}_{cfg_key}.npz")

    snapshots = []  # (label_steps, acc0, host dparams)
    cached_snaps = [_load_tree(draft_cache_path(f"s{n}"), dtempl)
                    for n in DISTILL_SNAPSHOTS]
    sec_per_step = 1.3  # cold-path estimate, refined below if we distill
    if all(t is not None for t, _ in cached_snaps):
        snapshots = [(n, m["acc0"], t) for n, (t, m)
                     in zip(DISTILL_SNAPSHOTS, cached_snaps)]
        log(f"[bench] distill cache hit ({len(snapshots)} snapshots)")
    else:
        # deep-copy: the donated step must not eat dparams0's leaves (embed
        # is shared with the target params; dparams0 is reused by QAT)
        dparams = jax.tree.map(lambda x: jnp.array(x, copy=True),
                               dict(dparams0))
        opt_state = opt.init(ttt.partition_trainable(dparams)[0])
        prev = 0
        for snap in DISTILL_SNAPSHOTS:
            dparams, opt_state, m = distill_resilient(dparams, opt_state,
                                                      data[:TRAIN_ROWS],
                                                      snap - prev)
            prev = snap
            acc0 = float(np.asarray(m.accs)[0])
            host = jax.tree.map(np.asarray, dparams)
            snapshots.append((snap, acc0, host))
            _save_tree(draft_cache_path(f"s{snap}"), host,
                       {"acc0": acc0, "accs": np.asarray(m.accs).tolist()})
            log(f"[bench] distill step {snap}: acc={np.asarray(m.accs)}")
        sec_per_step = (time.time() - t2) / max(DISTILL_SNAPSHOTS)
        log(f"[bench] distill {time.time()-t2:.1f}s "
            f"({sec_per_step:.2f}s/step)")
        del dparams, opt_state

    # ---- vanilla baseline: slope timing + bandwidth utilization
    test_prompt = prompts[0]
    tv_lo, _ = timed(lambda: retry_flake(lambda: eng.generate_vanilla(
        test_prompt, max_new_tokens=LO, fused=True)))
    tv_hi, _ = timed(lambda: retry_flake(lambda: eng.generate_vanilla(
        test_prompt, max_new_tokens=HI, fused=True)))
    vstep_ms = 1e3 * (tv_hi - tv_lo) / (HI - LO)
    vanilla_tps = 1e3 / vstep_ms
    # vanilla decode is weight-streaming-bound: MBU = bytes/step ÷ peak-BW
    mbu_vanilla = (target_bytes / (vstep_ms / 1e3)) / PEAK_BW
    log(f"[bench] vanilla step {vstep_ms:.2f}ms ({vanilla_tps:.1f} tok/s, "
        f"MBU {mbu_vanilla:.2f}; weight-streaming bound "
        f"{1e3*target_bytes/PEAK_BW:.2f}ms)")

    # ---- prefill throughput: slope between two prompt lengths (both pad
    # to exact 128-quantum buckets; the single decode step and dispatch
    # overhead cancel in the difference). Prefill is the MXU-bound phase —
    # MFU vs the 197 TFLOP/s peak is the honest utilization number.
    # Measurement discipline (BENCH_r04 lesson: a 256→768 best-of-3 slope
    # collapsed into mfu=3.1 because the expected Δt ≈ 24 ms was the same
    # order as the tunnel's dispatch jitter): widest spread the engine
    # holds (128→896, Δt ≈ 36 ms), min-of-5 per point, and a physicality
    # clamp — one remeasure on MFU > 1.0, then null rather than impossible.
    PF_LO, PF_HI = 128, 896
    pf_prompts = {n: rng.integers(0, V, size=n).astype(np.int32)
                  for n in (PF_LO, PF_HI)}

    def measure_prefill(reps=5):
        tp_lo, _ = timed(lambda: retry_flake(lambda: eng.generate_vanilla(
            pf_prompts[PF_LO], max_new_tokens=1, fused=True)), n=reps)
        tp_hi, _ = timed(lambda: retry_flake(lambda: eng.generate_vanilla(
            pf_prompts[PF_HI], max_new_tokens=1, fused=True)), n=reps)
        dt = max(tp_hi - tp_lo, 1e-9)
        tps = (PF_HI - PF_LO) / dt
        mfu = (2 * n_target_params * (PF_HI - PF_LO) / dt) / PEAK_FLOPS
        return tps, mfu

    prefill_tps, mfu_prefill = measure_prefill()
    if mfu_prefill > 1.0:
        log(f"[bench] prefill MFU {mfu_prefill:.2f} > 1 (tunnel jitter "
            "swallowed the slope); remeasuring once")
        prefill_tps, mfu_prefill = measure_prefill(reps=7)
    if mfu_prefill > 1.0:
        log(f"[bench] prefill MFU still impossible ({mfu_prefill:.2f}); "
            "reporting null rather than a nonphysical number")
        prefill_tps = mfu_prefill = None
    else:
        log(f"[bench] prefill {prefill_tps:.0f} tok/s "
            f"(MFU {mfu_prefill:.2f}; slope {PF_LO}->{PF_HI})")

    def measure_engine(e, idxs=(0, 1, 2), reps=3, forced=True):
        """Median (τ, round_ms, live_agreement) over corpus rows `idxs`,
        slope-timed.

        forced=True pins each run to its corpus row (see module docstring);
        live agreement = live-argmax hits / committed tokens at HI budget.
        """
        taus, rounds_ms, lives = [], [], []
        for pi in idxs:
            p = prompts[pi]
            fk = dict(force_tokens=data[pi]) if forced else {}

            def run(budget):
                return retry_flake(lambda: e.generate_fused(
                    p, max_new_tokens=budget, log=True, **fk))

            te_lo, out_lo = timed(lambda: run(LO), n=reps)
            te_hi, out_hi = timed(lambda: run(HI), n=reps)
            (n_lo, r_lo), (n_hi, r_hi) = out_lo[1:3], out_hi[1:3]
            dr = max(r_hi - r_lo, 1)
            taus.append((n_hi - n_lo) / dr)
            rounds_ms.append(1e3 * (te_hi - te_lo) / dr)
            if forced:
                lives.append(out_hi[3] / max(n_hi, 1))
        return (float(np.median(taus)), float(np.median(rounds_ms)),
                float(np.median(lives)) if lives else -1.0)

    # ======== budget-gated measurement program ========
    # Everything below the bf16 headline is OPTIONAL: each stage runs only
    # if the wall-clock budget has room (estimate-gated), and a stage
    # failure is logged, not fatal — the JSON line ALWAYS prints (the
    # BENCH_r03 rc=124 lesson). Stage order = evidentiary priority.
    deadline = t0 + BUDGET_S

    def left():
        return deadline - time.time()

    def stage(name, est, fn):
        if left() < est:
            log(f"[bench] SKIP {name} ({left():.0f}s left < ~{est:.0f}s)")
            return None
        ts = time.time()
        try:
            r = fn()
            log(f"[bench] stage {name} {time.time()-ts:.1f}s "
                f"({left():.0f}s left)")
            return r
        except Exception as e:
            log(f"[bench] stage {name} FAILED: {type(e).__name__}: {e}")
            return None

    # ---- bf16 headline (required). Config is fixed: "xla" attention (the
    # greedy==vanilla bit-exactness invariant is part of the product) +
    # "xla" compaction (measured-best every round; see ecfg note).
    eng.dparams = jax.tree.map(jnp.asarray, snapshots[-1][2])
    tau, round_ms, live = measure_engine(eng, idxs=(0, 1, 2), reps=3)
    eagle_tps = tau * 1e3 / round_ms
    speedup = eagle_tps / vanilla_tps
    # round-level MFU: verify forward (tree_size tokens through the target)
    # + draft extension & beam steps (path_len + depth dispatches)
    flops_round = 2 * (n_target_params * ecfg.tree_size
                       + (draft_bytes // 2) * (ecfg.depth + 1) * ecfg.top_k)
    mfu_round = (flops_round / (round_ms / 1e3)) / PEAK_FLOPS
    log(f"[bench] headline bf16: vanilla {vanilla_tps:.1f} tok/s | "
        f"eagle {eagle_tps:.1f} tok/s | tau={tau:.2f} (live-agree "
        f"{live:.2f}) | speedup={speedup:.2f}x | round={round_ms:.2f}ms "
        f"(MFU {mfu_round:.2f}) | total {time.time()-t0:.0f}s")

    headline = {"operating_point": "bf16_draft", "tau": round(tau, 2),
                "round_ms": round(round_ms, 2), "speedup": round(speedup, 3)}
    eng_best = eng

    # ---- int4/int8 draft + QAT (highest-priority optional stages; int4
    # first — the r3 winner). Draft quantization is LOSSLESS — acceptance
    # only commits target-verified tokens, so greedy output stays bit-exact
    # (tests/test_quant.py, test_quant4.py) — which makes the QAT points
    # fair headline candidates against the same vanilla baseline. int4
    # runs the Pallas w4a8 kernel (ops/quant4.py). QAT warm-starts from
    # the 200-step bf16 snapshot: QAT_STEPS quantization-aware fine-tune
    # steps recover the τ that post-training quantization loses, at ~1/4
    # the cost of the from-scratch distills that blew the r3 budget.
    quant_results = {}

    def run_qat(qmode):
        nonlocal headline, eng_best
        path = draft_cache_path(f"{qmode}w{QAT_STEPS}")
        tree, _meta = _load_tree(path, dtempl)
        if tree is None:
            tcfg_q = dataclasses.replace(tcfg, quant_aware=qmode,
                                         lr=1e-3, warmup_steps=5)
            opt_q = ttt.make_optimizer(tcfg_q)
            # same residency discipline as the bf16 distill: donated
            # buffers, half-batches, bounded dispatch queue, segment retry —
            # and the same TRAIN_ROWS split so held-out rows stay clean
            step_q = jax.jit(lambda dp, os_, tp, b: ttt.train_step(
                dp, os_, tp, cfg, dcfg, tcfg_q, opt_q, b),
                donate_argnums=(0, 1))
            dparams_q = jax.tree.map(jnp.asarray, snapshots[-1][2])
            opt_state_q = opt_q.init(ttt.partition_trainable(dparams_q)[0])
            dparams_q, opt_state_q, mq = distill_resilient(
                dparams_q, opt_state_q, data[:TRAIN_ROWS], QAT_STEPS,
                step_fn=step_q)
            del opt_state_q
            tree = jax.tree.map(np.asarray, dparams_q)
            del dparams_q
            _save_tree(path, tree, {"acc0": float(np.asarray(mq.accs)[0]),
                                    "accs": np.asarray(mq.accs).tolist()})
            log(f"[bench] {qmode} QAT warm-start {QAT_STEPS} steps: "
                f"acc={np.asarray(mq.accs)}")
        ecfg_q = dataclasses.replace(ecfg, draft_quant=qmode)
        eng_q = EagleEngine(params, cfg, jax.tree.map(jnp.asarray, tree),
                            dcfg, ecfg_q)
        tau_q, round_q, _ = measure_engine(eng_q, reps=2)
        sp_q = (tau_q * 1e3 / round_q) / vanilla_tps
        quant_results[qmode] = {
            "tau": round(tau_q, 2), "round_ms": round(round_q, 2),
            "speedup": round(sp_q, 3)}
        log(f"[bench] {qmode}+QAT: tau={tau_q:.2f} round={round_q:.2f}ms "
            f"speedup={sp_q:.2f}x")
        if sp_q > headline["speedup"]:
            headline = {"operating_point": f"{qmode}_qat_draft",
                        **quant_results[qmode]}
            eng_best = eng_q

    for qmode in ("int4", "int8"):
        if os.environ.get(f"BENCH_{qmode.upper()}", "1") == "0":
            continue
        cached = os.path.exists(draft_cache_path(f"{qmode}w{QAT_STEPS}"))
        est = 80 + (0 if cached else QAT_STEPS * sec_per_step + 60)
        stage(f"qat_{qmode}", est, lambda q=qmode: run_qat(q))

    # speedup-vs-τ curve at the headline round time (τ-independent shapes).
    # speedup_at_tau5 rides in the headline block: it is the TRANSFERABLE
    # number (τ=5 = published EAGLE-3 range), whereas "speedup" is the
    # memorization-ceiling point of this random-weight emulation.
    speedup_at = {str(t): round((t * 1e3 / headline["round_ms"])
                                / vanilla_tps, 2)
                  for t in (3, 4, 5, 6, 7)}
    headline["speedup_at_tau5"] = speedup_at["5"]
    best_tps = headline["tau"] * 1e3 / headline["round_ms"]
    log(f"[bench] headline operating point: {headline}")

    # ---- τ-sweep: measured speedup at the earlier distillation snapshots
    # (the 200-step point IS the bf16 headline measurement above)
    sweep = [{"distill_steps": snapshots[-1][0],
              "acc0": round(snapshots[-1][1], 3), "tau": round(tau, 2),
              "round_ms": round(round_ms, 2), "speedup": round(speedup, 2)}]

    def run_sweep():
        try:
            for step_i, acc0, dp_host in snapshots[:-1]:
                eng.dparams = jax.tree.map(jnp.asarray, dp_host)
                tau_i, round_i, _ = measure_engine(eng, reps=2)
                sp_i = (tau_i * 1e3 / round_i) / vanilla_tps
                sweep.append({"distill_steps": step_i,
                              "acc0": round(acc0, 3),
                              "tau": round(tau_i, 2),
                              "round_ms": round(round_i, 2),
                              "speedup": round(sp_i, 2)})
                log(f"[bench] sweep step={step_i} acc0={acc0:.3f} "
                    f"tau={tau_i:.2f} round={round_i:.2f}ms "
                    f"speedup={sp_i:.2f}x")
        finally:
            # a mid-loop flake must not leave later stages measuring a
            # weak early snapshot (stage() swallows the exception)
            eng.dparams = jax.tree.map(jnp.asarray, snapshots[-1][2])
        sweep.sort(key=lambda s: s["distill_steps"])

    stage("tau_sweep", 70, run_sweep)

    # ---- held-out τ: corpus rows the draft never trained on. Expected ≈1
    # for a random-weight target (nothing generalizable to learn — see
    # module docstring); reported as the memorization disclosure. Plus the
    # free-running τ (no forced replay): collapses once a ulp-flip knocks
    # the trajectory off-corpus — reported for honesty, never headline.
    extra = {}

    def run_heldout():
        heldout_idxs = tuple(range(TRAIN_ROWS, B))
        tau_ho, round_ho, _ = measure_engine(eng, idxs=heldout_idxs, reps=2)
        log(f"[bench] held-out rows {heldout_idxs}: tau={tau_ho:.2f} "
            f"round={round_ho:.2f}ms")
        extra["tau_heldout"] = round(tau_ho, 2)

    def run_free():
        tau_free, _, _ = measure_engine(eng, idxs=(0, 1), reps=2,
                                        forced=False)
        extra["tau_free"] = round(tau_free, 2)

    stage("tau_heldout", 50, run_heldout)
    stage("tau_free", 40, run_free)

    # ---- compaction A/B at full scale (xla vs pallas compact_rows).
    # Compaction must be bit-transparent (pure row moves) — asserted via a
    # free-running output comparison (identical cache bits ⇒ identical
    # trajectory). The pallas_tree ATTENTION kernel is retired from this
    # A/B: it lost at every measured operating point — S=1024 rounds (r2:
    # 17.45 vs 17.61+ ms; r3: 18.04 vs 18.06+) AND long live contexts
    # inside a max_len=4096 engine (r4, tools/probe_attn_long.py: −6.0%
    # at ctx≈240, −6.8% at ctx≈1500, −3.9% at ctx≈3000). XLA's fused
    # mask-add attention beats the flash-style kernel everywhere the
    # engine operates; the kernel stays test-only (`attn_impl=
    # "pallas_tree"`, tests/test_pallas_attn.py).
    ab = {}

    def run_ab():
        ref_out = None
        for compact in ("xla", "pallas"):
            ecfg_ab = dataclasses.replace(ecfg, compact_impl=compact)
            e_ab = EagleEngine(params, cfg, eng.dparams, dcfg, ecfg_ab)
            out = retry_flake(lambda: e_ab.generate_fused(
                test_prompt, max_new_tokens=HI))
            if ref_out is None:
                ref_out = out
            else:
                n = min(len(ref_out), len(out))
                assert np.array_equal(out[:n], ref_out[:n]), (
                    "compaction changed outputs")
            tau_ab, round_ab, _ = measure_engine(e_ab, idxs=(0, 1),
                                                 reps=2)
            ab[f"xla+{compact}"] = round(round_ab, 2)
            log(f"[bench] A/B compact={compact}: "
                f"round={round_ab:.2f}ms (tau={tau_ab:.2f})")
        best_combo = min(ab, key=ab.get)
        log(f"[bench] A/B best: {best_combo} ({ab[best_combo]:.2f}ms)")

    stage("kernel_ab", 120, run_ab)

    # ---- batched serving: aggregate tokens/s at B in {1, 4, 8} on the
    # headline engine. Forced replay per sequence (same reasoning as B=1:
    # keeps every sequence on its draft's training distribution, so the
    # measurement reflects τ at the trained operating point rather than the
    # emulation's bf16-chaos collapse; every timed component runs unchanged)
    serving = {"1": round(best_tps, 1)}

    def agg_tps(eng_b, Bs):
        bp = [data[i % B, :Lp] for i in range(Bs)]
        brefs = [data[i % B] for i in range(Bs)]

        def run_batch(budget):
            outs = retry_flake(lambda: eng_b.generate_batch_fused(
                bp, max_new_tokens=budget, force_tokens=brefs))
            return sum(len(o) - Lp for o in outs)

        tb_lo, n_lo = timed(lambda: run_batch(LO), n=2)
        tb_hi, n_hi = timed(lambda: run_batch(HI), n=2)
        return (n_hi - n_lo) / (tb_hi - tb_lo)

    def run_serving():
        for Bs in (4, 8):
            agg = agg_tps(eng_best, Bs)
            serving[str(Bs)] = round(agg, 1)
            log(f"[bench] serving B={Bs}: {agg:.1f} aggregate tok/s "
                f"({agg / best_tps:.2f}x of B=1)")

    stage("serving", 150, run_serving)

    # ---- serving-calibrated tree at B=8: the batched round is verify-
    # compute-bound (B·tree_size tokens through the target each step), so
    # throughput wants a smaller tree than the B=1 latency point. A/B is
    # fully measured (round time AND τ, via the same forced replay) on
    # params-sharing siblings (engine.with_tree); smaller depth lowers the
    # per-round commit bound, so this trades τ for round time — the JSON
    # records the whole frontier and serving["8"] picks the best.
    serving_tree_b8 = {}

    def run_tree_b8():
        serving_tree_b8[f"{ecfg.total_tokens}/d{ecfg.depth}"] = serving["8"]
        for tt, dd in ((47, 6), (31, 5)):
            agg = agg_tps(eng_best.with_tree(total_tokens=tt, depth=dd), 8)
            serving_tree_b8[f"{tt}/d{dd}"] = round(agg, 1)
            log(f"[bench] serving B=8 tree={tt}/d{dd}: {agg:.1f} aggregate "
                f"tok/s ({agg / best_tps:.2f}x of B=1)")
        serving["8"] = max(serving_tree_b8.values())

    if "8" in serving:
        stage("serving_tree_b8", 150, run_tree_b8)

    # ---- int8 KV cache at the operating points where KV streaming is real
    # HBM traffic (EngineConfig.kv_quant="int8", ops/kv_cache.py): B=8 at
    # ~1.9 GB of per-round KV reads (28L·8h·2048rows·128d·2B·2(k,v)·8slots)
    # and B=1 at ≥3.8k live context. Round time is τ-independent (fixed
    # shapes), so the clean comparison is the Δtime/Δrounds slope per KV
    # mode on identical prompts; aggregate tok/s rides along. Greedy
    # bit-exactness *within* the int8-KV point is the tested invariant
    # (tests/test_kv_int8.py); this stage measures what the halved
    # streaming buys.
    kv8 = {}

    def run_kv8():
        CTXB, NB = 1900, 8
        bp = [rng.integers(0, V, size=CTXB).astype(np.int32)
              for _ in range(NB)]
        for kvq in ("none", "int8"):
            e = eng_best._sibling(max_len=2048, kv_buckets=None,
                                  kv_quant=kvq)

            def runb(budget, e=e):
                _, committed, rounds = retry_flake(
                    lambda: e.generate_batch_fused(bp, max_new_tokens=budget,
                                                   log=True))
                return sum(committed), rounds

            tb_lo, (n_lo, r_lo) = timed(lambda: runb(LO), n=2)
            tb_hi, (n_hi, r_hi) = timed(lambda: runb(HI), n=2)
            dr = max(r_hi - r_lo, 1)
            kv8[f"b8_ctx{CTXB}_round_ms_{kvq}"] = round(
                1e3 * (tb_hi - tb_lo) / dr, 2)
            kv8[f"b8_ctx{CTXB}_agg_tps_{kvq}"] = round(
                (n_hi - n_lo) / max(tb_hi - tb_lo, 1e-9), 1)
            del e
        log(f"[bench] kv int8 B=8 ctx{CTXB}: "
            f"bf16 {kv8[f'b8_ctx{CTXB}_round_ms_none']}ms vs "
            f"int8 {kv8[f'b8_ctx{CTXB}_round_ms_int8']}ms/round")

    def run_kv1_long():
        CTX1 = 3800
        p1 = rng.integers(0, V, size=CTX1).astype(np.int32)
        for kvq in ("none", "int8"):
            e = eng_best._sibling(max_len=4096, kv_buckets=None,
                                  kv_quant=kvq)

            def run1(budget, e=e):
                return retry_flake(lambda: e.generate_fused(
                    p1, max_new_tokens=budget, log=True))

            t_lo, o_lo = timed(lambda: run1(LO), n=2)
            t_hi, o_hi = timed(lambda: run1(HI), n=2)
            dr = max(o_hi[2] - o_lo[2], 1)
            kv8[f"b1_ctx{CTX1}_round_ms_{kvq}"] = round(
                1e3 * (t_hi - t_lo) / dr, 2)
            del e
        log(f"[bench] kv int8 B=1 ctx{CTX1}: "
            f"bf16 {kv8[f'b1_ctx{CTX1}_round_ms_none']}ms vs "
            f"int8 {kv8[f'b1_ctx{CTX1}_round_ms_int8']}ms/round")

    stage("kv_int8_b8", 260, run_kv8)
    stage("kv_int8_b1_long", 200, run_kv1_long)

    log(f"[bench] total {time.time()-t0:.0f}s "
        f"(budget {BUDGET_S:.0f}s)")
    print(json.dumps({
        "metric": "e2e_speedup_vs_vanilla",
        "value": headline["speedup"],
        "unit": "x",
        "vs_baseline": round(headline["speedup"] / 3.0, 3),
        "headline": headline,
        "speedup_at_tau5": headline["speedup_at_tau5"],
        "target_params_b": round(n_target_params / 1e9, 2),
        "vanilla_tps": round(vanilla_tps, 1),
        "eagle_tps_bf16": round(eagle_tps, 1),
        "speedup_bf16": round(speedup, 3),
        "tau": round(tau, 2),
        "speedup_at_tau": speedup_at,
        "live_agreement": round(live, 3),
        "prefill_tps": (None if prefill_tps is None
                        else round(prefill_tps, 0)),
        "mfu_prefill": (None if mfu_prefill is None
                        else round(mfu_prefill, 3)),
        "round_ms": round(round_ms, 2),
        "vanilla_step_ms": round(vstep_ms, 2),
        "mbu_vanilla": round(mbu_vanilla, 3),
        "mfu_round": round(mfu_round, 3),
        "speedup_vs_tau": sweep,
        **extra,                                   # tau_heldout, tau_free
        **({"kernel_ab_round_ms": ab} if ab else {}),
        **({"serving_agg_tps": serving} if "8" in serving else {}),
        **({"serving_tree_b8": serving_tree_b8} if serving_tree_b8 else {}),
        **({"kv_int8": kv8} if kv8 else {}),
        **({f"{q}_qat": r for q, r in quant_results.items()}),
    }))


if __name__ == "__main__":
    main()
