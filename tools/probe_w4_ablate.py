"""Ablate the w4 kernel's cost: unpack vs group-dots vs scale-accum.

Variants (all stream the same packed bytes; wrong math is fine, only time
matters):
  full       : the real kernel
  no_unpack  : dots run on the raw packed bytes (skips bitcast unpack)
  no_dots    : unpack + per-group f32 scale-sum of nibble column-sums
  one_dot    : unpack + ONE int8 dot per half (K/2 contraction), scales
               applied per half (wrong math; times the big-dot structure)
  dots8      : like full but group=1024 (4 groups instead of 32)
  fused_unpack : i32 words, unpack PER GROUP inside the dot loop (never
               materializes the full [K/2, bn] planes) — halves the VMEM
               footprint so bn can reach 2048; exact math
  batched_dot : i32 words, plane unpack + ONE batched dot_general over all
               groups ([G, M, bn] int32) + f32 scale reduction; exact math

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

import os as _os
S, K, N, M = 24, 4096, 4096, int(_os.environ.get("ABLATE_M", "32"))
R = 40
GROUP = 128
PEAK_BW = 819e9


def make_kernel(mode, group):
    hg = (K // 2) // group

    def kern(xq_ref, rs_ref, p_ref, s_ref, out_ref):
        p = p_ref[:]
        NB = p.shape[1]
        xq = xq_ref[:]
        if mode == "fused_unpack":
            # never materialize the planes: slice `group` K-rows' worth of
            # words (group//4 word rows carry lo rows [g·group,(g+1)·group)
            # AND the matching hi rows), unpack, dot, accumulate — exact
            wpg = group // 4
            acc = jnp.zeros((M, NB), jnp.float32)
            for g in range(hg):
                pw = p[g * wpg:(g + 1) * wpg, :]
                l8 = pltpu.bitcast(pw & 0x0F0F0F0F, jnp.int8)
                h8 = pltpu.bitcast((pw >> 4) & 0x0F0F0F0F, jnp.int8)
                dlo = jax.lax.dot_general(
                    xq[:, g * group:(g + 1) * group], l8,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                dhi = jax.lax.dot_general(
                    xq[:, K // 2 + g * group:K // 2 + (g + 1) * group], h8,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc += ((dlo - rs_ref[:, g:g + 1]).astype(jnp.float32)
                        * s_ref[g, :][None, :])
                acc += ((dhi - rs_ref[:, hg + g:hg + g + 1])
                        .astype(jnp.float32) * s_ref[hg + g, :][None, :])
            out_ref[:] = acc
            return
        if mode == "no_unpack":
            lo = p.astype(jnp.int8)
            hi = lo
        elif mode in ("i32_storage", "batched_dot"):
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
        if mode == "batched_dot":
            xl = jnp.transpose(
                xq[:, :K // 2].reshape(M, hg, group), (1, 0, 2))
            xh = jnp.transpose(
                xq[:, K // 2:].reshape(M, hg, group), (1, 0, 2))
            dl = jax.lax.dot_general(
                xl, lo.reshape(hg, group, NB),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)            # [hg, M, NB]
            dh = jax.lax.dot_general(
                xh, hi.reshape(hg, group, NB),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            d_all = jnp.concatenate([dl, dh], axis=0)        # [G, M, NB]
            corr = d_all - jnp.transpose(rs_ref[:], (1, 0))[:, :, None]
            out_ref[:] = jnp.sum(
                corr.astype(jnp.float32) * s_ref[:][:, None, :], axis=0)
            return
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
    i32_modes = ("i32_storage", "fused_unpack", "batched_dot")
    p_rows = K // 8 if mode in i32_modes else K // 2
    p_dtype = jnp.int32 if mode in i32_modes else jnp.uint8
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
    if mode in i32_modes:
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
    import sys
    print(f"[ablate] S={S} K={K} N={N} M={M}", flush=True)
    if len(sys.argv) > 1 and sys.argv[1] == "r4":
        # round-4 sweep: the roofline-gap candidates (VERDICT #6)
        run_mode("i32_storage", block_n=1024)
        run_mode("fused_unpack", block_n=1024)
        run_mode("fused_unpack", block_n=2048)
        run_mode("batched_dot", block_n=1024)
        run_mode("batched_dot", block_n=512)
    elif len(sys.argv) > 1 and sys.argv[1] == "m512":
        # batched-verify regime (M=512 via ABLATE_M): is the G-loop f32
        # scale work the int4 B=8 gap, and would bf16 dequant-dots win
        # where they lose at M=32?
        run_mode("fused_unpack", block_n=2048)
        run_mode("bf16_dots", block_n=1024)
        run_mode("one_dot_bf16", block_n=1024)
        run_mode("one_dot", block_n=2048)
    elif len(sys.argv) > 1 and sys.argv[1] == "r4b":
        # isolate the remaining gap at the fused_unpack winner:
        # unpack cost (no_unpack = same bytes, no bitcast work),
        # dot-count cost (group=256 halves the dots; timing-only),
        # parallel grid semantics, and the bn ceiling
        run_mode("no_unpack", block_n=1024)
        run_mode("no_unpack", block_n=2048)
        run_mode("fused_unpack", block_n=2048)
        run_mode("fused_unpack", block_n=2048, group=256)
        run_mode("fused_unpack", block_n=2048, group=512)
        run_mode("fused_unpack", block_n=1536)
        run_mode("fused_unpack", block_n=2048, parallel=True)
    else:
        for mode in ("full", "i32_storage", "no_unpack"):
            run_mode(mode)
            run_mode(mode, block_n=1024)
