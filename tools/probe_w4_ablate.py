"""Ablate the w4 kernel's cost: unpack vs group-dots vs scale-accum.

Variants (all stream the same packed bytes; wrong math is fine, only time
matters):
  full       : the real kernel
  no_unpack  : dots run on the raw packed bytes (skips bitcast unpack)
  no_dots    : unpack + per-group f32 scale-sum of nibble column-sums
  one_dot    : unpack + ONE int8 dot per half (K/2 contraction), scales
               applied per half (wrong math; times the big-dot structure)
  dots8      : like full but group=1024 (4 groups instead of 32)

Run: python tools/probe_w4_ablate.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

S, K, N, M = 24, 4096, 4096, 32
R = 40
GROUP = 128
PEAK_BW = 819e9


def make_kernel(mode, group):
    hg = (K // 2) // group

    def kern(xq_ref, rs_ref, p_ref, s_ref, out_ref):
        p = p_ref[:]
        NB = p.shape[1]
        xq = xq_ref[:]
        if mode == "no_unpack":
            lo = p.astype(jnp.int8)
            hi = lo
        elif mode == "i32_storage":
            # packed words arrive as int32 [K/8, NB] (native i32 DMA
            # tiling); unpack straight from the words
            lo = pltpu.bitcast(p & 0x0F0F0F0F, jnp.int8)     # [K/2, NB]
            hi = pltpu.bitcast((p >> 4) & 0x0F0F0F0F, jnp.int8)
        else:
            w32 = pltpu.bitcast(p, jnp.int32)
            lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.uint8).astype(jnp.int8)
            hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F,
                               jnp.uint8).astype(jnp.int8)
        acc = jnp.zeros((M, NB), jnp.float32)
        if mode == "no_dots":
            acc += jnp.sum(lo.astype(jnp.float32), axis=0)[None, :]
            acc += jnp.sum(hi.astype(jnp.float32), axis=0)[None, :]
        elif mode == "one_dot":
            for plane in (lo, hi):
                d = jax.lax.dot_general(
                    xq[:, : K // 2], plane, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc += d.astype(jnp.float32) * s_ref[0, :][None, :]
        elif mode == "bf16_dots":
            # ints <= 2^24 are exact in f32 MACs: bf16 nibble/act dots give
            # bit-identical integer results if the int8 MXU path is slow
            xb = xq.astype(jnp.bfloat16)
            for g in range(2 * hg):
                plane = lo if g < hg else hi
                r0 = (g % hg) * group
                d = jax.lax.dot_general(
                    xb[:, g * group:(g + 1) * group],
                    plane[r0:r0 + group, :].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += ((d - rs_ref[:, g:g + 1].astype(jnp.float32))
                        * s_ref[g, :][None, :])
        elif mode == "one_dot_bf16":
            xb = xq.astype(jnp.bfloat16)
            for plane in (lo, hi):
                d = jax.lax.dot_general(
                    xb[:, : K // 2], plane.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += d * s_ref[0, :][None, :]
        else:
            for g in range(2 * hg):
                plane = lo if g < hg else hi
                r0 = (g % hg) * group
                d = jax.lax.dot_general(
                    xq[:, g * group:(g + 1) * group],
                    plane[r0:r0 + group, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc += ((d - rs_ref[:, g:g + 1]).astype(jnp.float32)
                        * s_ref[g, :][None, :])
        out_ref[:] = acc
    return kern


def run_mode(mode, group=GROUP, block_n=256, parallel=False):
    G = K // group
    kern = make_kernel(mode, group)
    p_rows = K // 8 if mode == "i32_storage" else K // 2
    p_dtype = jnp.int32 if mode == "i32_storage" else jnp.uint8
    cp = (pltpu.CompilerParams(dimension_semantics=("parallel",))
          if parallel else None)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(xq, rs, bank_p, bank_s, reps):
        def mm(c, i):
            p = bank_p[i % S]
            s = bank_s[i % S]
            y = pl.pallas_call(
                kern,
                grid=(N // block_n,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, G), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p_rows, block_n), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((G, block_n), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                **({"compiler_params": cp} if cp else {}),
            )(xq, rs, p, s)
            # fold output into a tiny carry so iterations chain
            return c + y[0, :8].astype(jnp.float32), ()
        c, _ = jax.lax.scan(mm, jnp.zeros((8,), jnp.float32),
                            jnp.arange(reps * S))
        return c

    key = jax.random.PRNGKey(0)
    if mode == "i32_storage":
        bank_p = jax.random.randint(key, (S, K // 8, N), -2**31, 2**31 - 1,
                                    jnp.int32)
    else:
        bank_p = jax.random.randint(key, (S, K // 2, N), 0, 255,
                                    jnp.int32).astype(jnp.uint8)
    bank_s = jnp.full((S, G, N), 1e-3, jnp.float32)
    xq = jax.random.randint(key, (M, K), -127, 127, jnp.int32
                            ).astype(jnp.int8)
    rs = 8 * jnp.sum(xq.reshape(M, G, group).astype(jnp.int32), axis=2)

    def t(reps):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(run(xq, rs, bank_p, bank_s, reps))
            best = min(best, time.time() - t0)
        return best
    t(2)  # warm both trip counts' compiles? (static reps -> two compiles)
    t_lo, t_hi = t(10), t(R)
    per = (t_hi - t_lo) / ((R - 10) * S)
    bw = K * N * 0.5 / per
    print(f"[ablate] {mode:10s} group={group:5d} {per*1e6:7.1f} us/mm | "
          f"{bw/1e9:5.0f} GB/s real ({bw/PEAK_BW*100:4.1f}% peak) "
          f"bn={block_n} par={parallel}", flush=True)


if __name__ == "__main__":
    print(f"[ablate] S={S} K={K} N={N} M={M}", flush=True)
    for mode in ("full", "i32_storage", "no_unpack"):
        run_mode(mode)
        run_mode(mode, block_n=1024)
