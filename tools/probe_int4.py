"""Probe: can int4 weight-only matmul beat int8 on decode-shaped streaming?

Decode (small-M) matmuls are weight-streaming-bound, so bytes/param is the
whole game: bf16 = 2, int8 = 1, int4 = 0.5. The open question is whether
the int4 *unpack* cost (VPU) or XLA's handling of native s4 eats the
bandwidth win. Measures effective GB/s of logical weight bytes streamed
for each variant over a stacked [S, K, N] weight bank (scan over S so no
block is loop-invariant-hoisted):

  bf16      : plain bf16 dot (baseline)
  int8      : dynamic-act int8 x int8 dot, per-channel scales (ops/quant.py)
  s4_native : weights stored as jnp.int4, converted to int8 at use — tests
              whether XLA keeps s4 in HBM and fuses the convert
  w4_pallas : packed-nibble uint8 + Pallas kernel (ops/quant4.py), int8 MXU
              path with the -8 bias folded into a row-sum correction

Run on the real TPU:  python tools/probe_int4.py
"""
import functools
import time

from _probe_common import *  # noqa: F401,F403 — jax/jnp/np, retry, timers
from _probe_common import PEAK_BW, timed


def retry(fn, tries=3, wait=30):
    """Probe-local retry: also treats tunnel transport drops (UNAVAILABLE /
    broken pipe on the remote-compile endpoint) as transient."""
    for i in range(tries):
        try:
            return fn()
        except Exception as e:
            transient = any(s in str(e) for s in (
                "RESOURCE_EXHAUSTED", "FAILED_PRECONDITION", "UNAVAILABLE",
                "Broken pipe"))
            if not transient or i == tries - 1:
                raise
            print(f"[int4probe] transient {type(e).__name__}; retry in "
                  f"{wait}s", flush=True)
            time.sleep(wait)

import jax
import jax.numpy as jnp
import numpy as np

S, K, N, M = 24, 4096, 4096, 16
R = 40  # timed repeats inside one dispatch
LOGICAL_BYTES = {"bf16": 2.0, "int8": 1.0, "s4_native": 0.5,
                 "w4_pallas": 0.5, "w4_pallas_g": 0.5}


def run_variant(name, make_bank, apply_fn):
    """Build the weight bank on device, time R scan passes in one jit."""
    bank = make_bank(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)

    # bank passed as an ARGUMENT, never closed over: closure constants
    # ship the whole multi-hundred-MB tree inside the lowering and hang
    # the remote compiler (CLAUDE.md gotcha)
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(x, bk, reps):
        def step(x, i):
            w = jax.tree.map(lambda b: b[i % S], bk)
            y = apply_fn(x, w)
            # renormalized data dependency: next x depends on y, so
            # passes can't be reordered/elided
            x = (y[:, :K] / (1.0 + jnp.abs(y[:, :K]))).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(step, x, jnp.arange(reps * S))
        return x

    # SLOPE timing between two trip counts, result pulled to host: the
    # tunnel acks block_until_ready without real completion, and fixed
    # dispatch/transfer overhead cancels in the difference
    t_lo = timed(lambda: retry(
        lambda: np.asarray(run(x0, bank, R // 4))), n=3)
    t_hi = timed(lambda: retry(
        lambda: np.asarray(run(x0, bank, R))), n=3)
    per_mm = (t_hi - t_lo) / ((R - R // 4) * S)
    eff_bw = K * N * 2.0 / per_mm  # bf16-equivalent streamed bytes/s
    real_bw = K * N * LOGICAL_BYTES[name] / per_mm
    print(f"[int4probe] {name:12s} {per_mm*1e6:8.1f} us/matmul | "
          f"{real_bw/1e9:6.0f} GB/s real ({real_bw/PEAK_BW*100:4.1f}% peak) "
          f"| {eff_bw/1e9:6.0f} GB/s bf16-equiv", flush=True)
    return per_mm


def main():
    print(f"[int4probe] devices={jax.devices()} S={S} K={K} N={N} M={M}",
          flush=True)

    # ---- bf16 baseline
    run_variant(
        "bf16",
        lambda k: jax.random.normal(k, (S, K, N), jnp.bfloat16) * 0.02,
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16))

    # ---- int8 (ops/quant.py semantics)
    def make_int8(k):
        w = jax.random.normal(k, (S, K, N), jnp.float32) * 0.02
        from eagle_tpu.ops.quant import quantize_linear
        return jax.jit(jax.vmap(quantize_linear))(w)

    def apply_int8(x, qw):
        from eagle_tpu.ops.quant import qdense
        return qdense(x, qw, out_dtype=jnp.bfloat16)

    run_variant("int8", make_int8, apply_int8)

    # ---- native s4 storage, convert-at-use
    def make_s4(k):
        w = jax.random.normal(k, (S, K, N), jnp.float32) * 0.02
        amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int4)
        return {"q4": q, "scale": scale[:, 0, :]}

    def apply_s4(x, qw):
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                         1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, qw["q4"].astype(jnp.int8),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * qw["scale"][None, :]
                ).astype(jnp.bfloat16)

    try:
        run_variant("s4_native", make_s4, apply_s4)
    except Exception as e:
        print(f"[int4probe] s4_native FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # ---- Pallas packed-w4 kernel
    try:
        from eagle_tpu.ops.quant4 import pack_w4, qdense4
        def make_w4(k):
            w = jax.random.normal(k, (S, K, N), jnp.float32) * 0.02
            return jax.jit(jax.vmap(pack_w4))(w)
        run_variant("w4_pallas", make_w4,
                    lambda x, qw: qdense4(x, qw, out_dtype=jnp.bfloat16))
    except ImportError:
        print("[int4probe] quant4 not built yet; skipping w4_pallas",
              flush=True)
    except Exception as e:
        print(f"[int4probe] w4_pallas FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
