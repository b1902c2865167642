"""Weight-only int4 (w4a8) quantization with a Pallas TPU matmul kernel.

Decode-phase matmuls are weight-streaming-bound, so bytes/param sets the
step time: bf16 = 2, int8 = 1, int4 = 0.5. This module stores weights as
packed nibbles (eight int4 per little-endian i32 word — i32 streams HBM
at the native DMA rate where uint8 pays a tiling penalty, see
_pack_words) with GROUP-wise scales along the
contraction axis (group_size=128 by default — per-channel int4 is too
coarse; group-128 is the standard w4 operating point, cf. GPTQ/AWQ), and
provides:

  pack_w4(w)            float [K, N] -> {"q4": i32 words [K/8, N],
                                         "scale": f32 [K/group, N]}
  qdense4(x, qw)        x [.., K] @ w4 -> [.., N]; Pallas kernel on TPU,
                        XLA unpack fallback elsewhere
  fake_quantize4_*      straight-through int4 QAT (matches pack_w4 math)
  quantize_draft_params4 / quantize_target_params4
                        tree-level conversion mirroring ops/quant.py

Kernel design (qdense4_pallas), shaped by the v5e memory system:
- Weights are packed HALF-SPLIT along K: byte[k, n] holds W[k, n] in the
  low nibble and W[k + K/2, n] in the high nibble, each stored BIASED by
  +8 (q in [-7, 7] -> nibble in [1, 15]). Unpacking is then two bitwise
  ops on int32 lanes (mask / shift+mask — borrow-free because the -8 bias
  is NOT subtracted per element; see next point), and the two unpacked
  planes are used directly as the [0, K/2) and [K/2, K) row blocks — no
  interleaving shuffle.
- The -8 zero-point is folded into the matmul: with activations quantized
  to int8 (per-row dynamic scales, same rule as ops/quant.qdense),
  x @ (nib - 8) == x @ nib - 8 * rowsum(x), so the MXU consumes raw
  nibbles (int8 in [1, 15]) with int32 accumulation and the correction is
  one [M, 1] column subtract per group. No per-element int4->int8
  arithmetic anywhere — the VPU does only the two mask ops per 4 bytes.
- Grid over N blocks; one [K/2, NB] packed block (+ its [K/group, NB]
  scale block) is resident per step, double-buffered by the Pallas
  pipeline; the (small) activation block stays in VMEM across steps.
- Group partial sums: one int8 MXU dot per (group, half), scaled by the
  group's f32 scale and accumulated in f32. group_size=128 matches the
  MXU's native contraction tile, so the per-group dots are full-rate.

The reference has no analog (it is Python/eager-torch only, SURVEY §2.5);
the int8 analog and the losslessness argument live in ops/quant.py:
quantizing the DRAFT never changes outputs (acceptance only commits
target-verified tokens); quantizing the TARGET is a serving operating
point whose invariant is bit-exactness against its own vanilla decode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 128  # scale-group size along the contraction axis

# Test hook: route engine-level (interpret=None) qdense4 calls through the
# Pallas interpreter when not on TPU, instead of the qdense4_xla fallback.
FORCE_INTERPRET = False


def _eff_group(K: int, group: int) -> int:
    """Largest usable group ≤ `group`: must divide K/2 so scale groups
    never straddle the low/high packing halves (gcd handles the tiny
    test-config dims where 128 doesn't divide K/2)."""
    if K % 2:
        raise ValueError(f"int4 packing needs even K, got {K}")
    import math
    return math.gcd(K // 2, group)


def _blocks_of(q4: jnp.ndarray) -> int:
    """Block count from the packed tensor's rank: 2-D [K/8, N] is the
    single-block layout; 3-D [blocks, K/(8·blocks), N] is the
    tensor-parallel layout (leading axis shardable over the mesh)."""
    return 1 if q4.ndim == 2 else q4.shape[0]


def _k_of(qw: dict) -> int:
    """Contraction size from the packed dict (8 nibbles per i32 word)."""
    q4 = qw["q4"]
    return 8 * q4.shape[-2] * _blocks_of(q4)


def _group_of(qw: dict) -> int:
    """Recover the group size from the packed dict's shapes (the scale
    tensor is [K/group, N], block-split like q4) — keeps the layout
    self-describing."""
    scale = qw["scale"]
    groups = scale.shape[-2] * (1 if scale.ndim == 2 else scale.shape[0])
    return _k_of(qw) // groups


def _pack_words(nib: jnp.ndarray) -> jnp.ndarray:
    """Biased nibbles [K, N] uint8 -> int32 words [K/8, N].

    Byte k of word j (little-endian) packs rows 4j+k of the two halves:
    byte = nib[4j+k] | nib[4j+k + K/2] << 4. STORING int32 (not uint8)
    matters on TPU: the HBM->VMEM DMA of a uint8 array runs through
    (32,128) int8 tiling at reduced rate — i32 words stream at the native
    rate (+13% end-to-end, tools/probe_w4_ablate.py i32_storage)."""
    K, N = nib.shape
    b = (nib[: K // 2] | (nib[K // 2:] << 4)).astype(jnp.int32)  # [K/2, N]
    b = b.reshape(K // 8, 4, N)
    return (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            | (b[:, 3] << 24)).astype(jnp.int32)


def _unpack_nibbles_xla(p: jnp.ndarray):
    """int32 words [K/8, N] -> (lo, hi) int8 [K/2, N] biased nibbles, in
    plain XLA (mirrors the kernel's bitcast expansion order)."""
    Kw, N = p.shape
    bs = [(p >> (8 * i)) & 0xFF for i in range(4)]        # bytes, LE
    b = jnp.stack(bs, axis=1).reshape(4 * Kw, N)          # [K/2, N]
    return (b & 0xF).astype(jnp.int8), ((b >> 4) & 0xF).astype(jnp.int8)


def pack_w4(w: jnp.ndarray, group: int = GROUP, blocks: int = 1) -> dict:
    """[K, N] float -> {"q4": int32 [K/8, N], "scale": f32 [K/group, N]}.

    Symmetric per-(group, output-channel) scales; nibbles biased +8,
    half-split along K (low nibble = rows [0, K/2), high = [K/2, K)),
    four bytes per little-endian i32 word (see _pack_words).

    blocks > 1 emits the tensor-parallel layout: q4 [blocks, K/(8b), N] /
    scale [blocks, K/(b·group), N], where each leading-axis slice is a
    self-contained half-split packing of a CONTIGUOUS K range — so
    sharding the block axis over the mesh gives every shard a standalone
    valid layout whose activation slice is contiguous (Megatron
    row-parallel: local kernel + one psum). The group accumulation order
    stays K-sequential for any block count, so blocks=1 and blocks=t are
    bit-identical unsharded — PROVIDED the effective group is the same:
    when K/blocks is too small for `group` to divide (K/blocks)/2, the
    per-block scales become finer than the blocks=1 packing and outputs
    legitimately differ (a warning is emitted)."""
    K, N = w.shape
    if K % (8 * blocks):
        raise ValueError(f"int4 packing needs 8*blocks={8*blocks} | K={K}")
    Kb = K // blocks
    if blocks > 1 and _eff_group(Kb, group) != _eff_group(K, group):
        import warnings
        warnings.warn(
            f"pack_w4: blocks={blocks} shrinks the effective scale group "
            f"({_eff_group(K, group)} -> {_eff_group(Kb, group)} at K={K}); "
            "outputs will differ from the blocks=1 packing", stacklevel=2)
    group = _eff_group(Kb, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(wf), axis=1)                   # [K/g, N]
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    nib = (q + 8.0).astype(jnp.uint8).reshape(K, N)       # [1, 15]
    if blocks == 1:
        return {"q4": _pack_words(nib), "scale": scale}
    nib_b = nib.reshape(blocks, Kb, N)
    by = (nib_b[:, : Kb // 2] | (nib_b[:, Kb // 2:] << 4)).astype(jnp.int32)
    by = by.reshape(blocks, Kb // 8, 4, N)
    words = (by[:, :, 0] | (by[:, :, 1] << 8) | (by[:, :, 2] << 16)
             | (by[:, :, 3] << 24)).astype(jnp.int32)
    return {"q4": words, "scale": scale.reshape(blocks, -1, N)}


def _nibbles_korder(q4: jnp.ndarray) -> jnp.ndarray:
    """Packed words (2-D or blocked 3-D) -> biased nibbles [K, N] int8 in
    K order (per block: low half rows then high half rows)."""
    blocks = _blocks_of(q4)
    N = q4.shape[-1]
    lo, hi = _unpack_nibbles_xla(q4.reshape(-1, N))       # [K/2, N] each
    lo = lo.reshape(blocks, -1, N)
    hi = hi.reshape(blocks, -1, N)
    return jnp.concatenate([lo, hi], axis=1).reshape(-1, N)


def unpack_w4(qw: dict, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize back to [K, N] float (reference path; materializes)."""
    if qw["q4"].ndim not in (2, 3):
        raise ValueError(  # rank encodes the layout; see _blocks_of
            f"packed q4 must be 2-D or blocked 3-D, got {qw['q4'].shape}")
    N = qw["q4"].shape[-1]
    q = _nibbles_korder(qw["q4"]).astype(jnp.int32) - 8   # [K, N]
    scale = qw["scale"].reshape(-1, N)                    # K-ordered groups
    return (q.reshape(scale.shape[0], -1, N)
            * scale[:, None, :]).reshape(-1, N).astype(dtype)


def _quantize_acts(x: jnp.ndarray):
    """Per-row dynamic symmetric int8 activation quantization — delegates
    to the single rule in ops/quant.quantize_rows so w4 and w8 layers see
    identical activation error."""
    from .quant import quantize_rows

    return quantize_rows(x)


def qdense4_xla(x: jnp.ndarray, qw: dict, b: Optional[jnp.ndarray] = None,
                out_dtype=None) -> jnp.ndarray:
    """Reference/fallback path: per-group int8 dots in plain XLA.

    Bit-identical to the Pallas kernel (both accumulate per-group int32
    dots, apply the -8 rowsum correction, and sum f32 partials in the
    same group order) — the CPU test suite and non-TPU backends run this.
    """
    shape = x.shape
    K = shape[-1]
    N = qw["q4"].shape[-1]
    group = _group_of(qw)
    G = K // group
    xq, sx = _quantize_acts(x.reshape(-1, K))
    M = xq.shape[0]
    nib = _nibbles_korder(qw["q4"])                       # [K, N] 1..15
    # batched per-group dots: [G, M, g] x [G, g, N] -> [G, M, N]
    xg = jnp.transpose(xq.reshape(M, G, group), (1, 0, 2))
    wg = nib.reshape(G, group, N)
    acc = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                 # [G, M, N]
    rowsum = jnp.sum(xg.astype(jnp.int32), axis=2)        # [G, M]
    corr = acc - 8 * rowsum[:, :, None]
    y = jnp.sum(corr.astype(jnp.float32)
                * qw["scale"].astype(jnp.float32).reshape(G, N)[:, None, :],
                axis=0)
    y = (y * sx).astype(out_dtype or x.dtype).reshape(shape[:-1] + (N,))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _w4_kernel(xq_ref, rs_ref, p_ref, s_ref, out_ref, *, group: int,
               blocks: int, interpret: bool = False):
    """One N-block: unpack nibbles, per-group int8 MXU dots with the -8
    zero-point folded into the precomputed rowsums.

    Weights arrive as packed i32 words (see _pack_words — i32 streams HBM
    at the native DMA rate where uint8 paid a tiling penalty). Unpack is
    two mask ops on i32 lanes (4 bytes per op; Mosaic has no 8-bit shift)
    and a bitcast expansion to int8 sublanes — nibble values are 0..15,
    identical bits in int8, so no convert op is emitted.

    `blocks` describes the TP packing layout (pack_w4 blocks=t flattened
    along the word axis): unpacked plane rows [b*Kb/2, (b+1)*Kb/2) hold
    block b's low/high half rows. The group loop visits groups in K order
    for ANY block count, so all layouts produce bit-identical f32 sums."""
    out_ref[:] = _w4_block_acc(p_ref[:], xq_ref[:], rs_ref[:], s_ref[:],
                               group=group, blocks=blocks,
                               interpret=interpret)


def _w4_block_acc(p, xq, rs, s, *, group: int, blocks: int,
                  interpret: bool) -> jnp.ndarray:
    """In-kernel w4a8 block matmul body (shared by _w4_kernel and the
    fused score+topk kernel, ops/score_topk.py): packed words [K/8, NB] ×
    int8 activations [M, K] -> f32 [M, NB] (activation scales NOT applied;
    numerics identical for any caller — exact int dots, fixed f32 group
    order).

    Unpack is FUSED into the group loop: each dot unpacks only its own
    `group` plane rows from a group//4-row word slice, so the full
    [K/2, NB] lo/hi planes are never materialized in VMEM. That halves the
    kernel's VMEM footprint, which is what lets the caller raise the
    N-block to 2048 (measured +17% end-to-end streaming at decode shapes,
    tools/probe_w4_ablate.py r4 sweep: 24.3 -> 20.3 µs/mm at K=N=4096).
    The f32 accumulation order (block -> half -> group, K-ascending) is
    unchanged from the plane-materializing version, preserving bitwise
    identity with qdense4_xla. Unpacking a slice twice (once for each
    half) costs ~nothing: the no_unpack ablation ties fused_unpack."""
    from jax.experimental.pallas import tpu as pltpu

    NB = p.shape[1]
    K = xq.shape[1]
    Kb = K // blocks                                      # rows per block
    hgb = Kb // 2 // group                                # half-groups/block
    wpg = group // 4                                      # word rows/group

    def unpack(pw, half):
        if interpret:
            # the CPU interpreter lacks Mosaic's sublane-expanding bitcast;
            # emulate the same little-endian byte order with shifts
            bs = [(pw >> (8 * i)) & 0xFF for i in range(4)]
            b = jnp.stack(bs, axis=1).reshape(4 * pw.shape[0], NB)
            nib = b & 0xF if half == 0 else (b >> 4) & 0xF
            return nib.astype(jnp.int8)
        word = pw & 0x0F0F0F0F if half == 0 else (pw >> 4) & 0x0F0F0F0F
        return pltpu.bitcast(word, jnp.int8)              # [group, NB]

    acc = jnp.zeros((xq.shape[0], NB), jnp.float32)
    g_idx = 0
    for blk in range(blocks):
        for half in (0, 1):
            for g in range(hgb):
                w0 = blk * (Kb // 8) + g * wpg            # word row
                plane = unpack(p[w0:w0 + wpg, :], half)
                dot = jax.lax.dot_general(
                    xq[:, g_idx * group:(g_idx + 1) * group],
                    plane,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)     # [M, NB]
                corr = dot - rs[:, g_idx:g_idx + 1]       # fold -8 bias
                acc = acc + (corr.astype(jnp.float32)
                             * s[g_idx, :][None, :])
                g_idx += 1
    return acc


@functools.partial(jax.jit,
                   static_argnames=("group", "blocks", "block_n",
                                    "interpret"))
def _qdense4_pallas_2d(xq, rowsums, q4, scale, group: int = GROUP,
                       blocks: int = 1, block_n: int = 2048,
                       interpret: bool = False):
    """Grid = (N blocks, M blocks), M minor: a weight block (the big
    streamed operand) is loaded once and reused across every M block,
    while the small activation block cycles — so decode (one M block) and
    prefill (several) stream each weight byte exactly once per N sweep.
    Per-row numerics are M-blocking-independent (exact int dots, fixed
    f32 group order), preserving verify==vanilla bit-exactness."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    Kw, N = q4.shape
    G = K // group
    # Block size: bigger N blocks amortize per-grid-step overhead
    # (measured: 38% -> 47% of peak going 256 -> 1024, and a further +17%
    # at bn=2048 once fused unpack freed the plane VMEM,
    # tools/probe_w4_ablate.py). VMEM per pipelined input block is now
    # just the packed words (K/2 * bn bytes, x2 buffers); per-group
    # unpack temporaries are ~group*bn. Budget the packed block at ~4 MB
    # (K=12288 -> bn 640, K<=4096 -> the 2048 cap). The grid is
    # ceil-divided: Pallas masks the ragged edge block itself, so N need
    # NOT divide bn (a divisibility requirement here forced the
    # 32000-wide draft lm_head down to bn=256 -> 125 grid steps -> ~10x
    # the streaming ideal per scoring call; found by
    # tools/profile_round.py).
    bn = max(128, min(block_n, (4 << 20) // (K // 2) // 128 * 128, N))
    bm = _pick_bm(M, K)
    kernel = functools.partial(_w4_kernel, group=group, blocks=blocks,
                               interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(N, bn), M // bm),
        in_specs=[
            pl.BlockSpec((bm, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, G), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kw, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(xq, rowsums, q4, scale)


def _pick_bm(M: int, K: int) -> int:
    """M block: the largest divisor of M (padded to 32) that is <= 128 —
    verify rounds are M=64 and padding them to 128 would double the
    MXU/VPU work — AND whose activation block bm*K stays <= 2 MB: at the
    MoE expert-fold's K=E*F (e.g. 32768) a bm=128 activation block alone
    is 4 MB and, double-buffered next to the packed weight blocks, blows
    the 16 MB VMEM budget (measured: 25.35 M scoped-vmem OOM)."""
    for c in (128, 96, 64, 32):
        if M % c == 0 and c * K <= (2 << 20):
            return c
    return 32


def _qdense4_core(x2d, q4, scale, *, interpret: bool):
    """[M, K] float @ packed int4 -> [M, N] f32 (activation-quantized,
    kernel-backed). Rows are independent and numerically M-invariant.
    q4/scale may be 2-D (blocks=1) or blocked 3-D (TP layout) — blocked
    tensors are flattened along the word axis and the block structure is
    passed to the kernel statically."""
    if q4.ndim not in (2, 3):
        raise ValueError(  # a stacked [L, K/8, N] leaf would be misread
            f"packed q4 must be 2-D or blocked 3-D, got {q4.shape}")
    K = x2d.shape[-1]
    blocks = _blocks_of(q4)
    N = q4.shape[-1]
    q4f = q4.reshape(-1, N)
    scf = scale.reshape(-1, N).astype(jnp.float32)        # [G, N] K-order
    group = K // scf.shape[0]
    G = K // group
    xq, sx = _quantize_acts(x2d)
    M = xq.shape[0]
    # pad M to the int8 sublane tile (32); the kernel picks an M block
    # that divides the padded size
    Mp = -(-M // 32) * 32
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    # 8 * per-group rowsums, precomputed in XLA (tiny: [M, G])
    rs = 8 * jnp.sum(xq.reshape(Mp, G, group).astype(jnp.int32), axis=2)
    y = _qdense4_pallas_2d(xq, rs, q4f, scf, group=group, blocks=blocks,
                           interpret=interpret)
    return y[:M] * sx


def _w4_kernel_stacked(l_ref, xq_ref, rs_ref, p_ref, s_ref, out_ref, *,
                       group: int, interpret: bool = False):
    """Stacked-weight variant: the layer index arrives as a scalar-prefetch
    arg and the BlockSpec index_maps select layer l's blocks straight out
    of the stacked [L, K/8, N] HBM array — the DMA reads the stacked
    array in place. Math identical to _w4_kernel (blocks=1)."""
    del l_ref  # consumed by the index_maps
    out_ref[:] = _w4_block_acc(p_ref[0], xq_ref[:], rs_ref[:], s_ref[0],
                               group=group, blocks=1, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("group", "block_n", "interpret"))
def _qdense4_pallas_stacked(xq, rowsums, q4, scale, layer,
                            group: int = GROUP, block_n: int = 2048,
                            interpret: bool = False):
    """Like _qdense4_pallas_2d, but q4/scale keep their stacked leading
    layer axis ([L, K/8, N] / [L, G, N]) and `layer` (traced int32 scalar)
    picks the layer INSIDE the kernel via scalar-prefetch index_maps.

    Why this exists: inside a lax.scan over layers, a per-layer weight
    slice feeding a custom call must be MATERIALIZED by XLA (unlike a
    jnp.dot operand, where the slice fuses into the consumer). Profiled on
    the 4B int4 target: ~2.9 ms/step of pure dynamic-slice copies — more
    than the matmul kernels themselves (tools/profile_vanilla_int4.py).
    Indexing in the kernel eliminates the copies entirely."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    L, Kw, N = q4.shape
    G = K // group
    bn = max(128, min(block_n, (4 << 20) // (K // 2) // 128 * 128, N))
    bm = _pick_bm(M, K)
    kernel = functools.partial(_w4_kernel_stacked, group=group,
                               interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(N, bn), M // bm),
            in_specs=[
                pl.BlockSpec((bm, K), lambda j, i, l: (i, 0)),
                pl.BlockSpec((bm, G), lambda j, i, l: (i, 0)),
                pl.BlockSpec((1, Kw, bn), lambda j, i, l: (l[0], 0, j)),
                pl.BlockSpec((1, G, bn), lambda j, i, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, i, l: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(layer.astype(jnp.int32), xq, rowsums, q4, scale)


_STACKED_CACHE: dict = {}
_STACKED_PART_CACHE: dict = {}


def _stacked_core(x2d, q4, scale, layer, *, interpret: bool):
    K = x2d.shape[-1]
    scf = scale.astype(jnp.float32)
    group = K // scf.shape[-2]
    xq, sx = _quantize_acts(x2d)
    M = xq.shape[0]
    Mp = -(-M // 32) * 32
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
    rs = 8 * jnp.sum(
        xq.reshape(Mp, K // group, group).astype(jnp.int32), axis=2)
    y = _qdense4_pallas_stacked(xq, rs, q4, scf, layer, group=group,
                                interpret=interpret)
    return y[:M] * sx


def _get_stacked_partitioned(interpret: bool):
    """custom_partitioning for the stacked core: column-parallel stacked
    weights ([L, K/8, N] sharded on N — the TP layout for
    wq/wk/wv/w_gate/w_up) run the kernel locally per shard, bit-exact.
    Row-parallel weights use the blocked 4-D layout and never reach this
    path. Replicated/unsharded: plain local call."""
    if interpret in _STACKED_PART_CACHE:
        return _STACKED_PART_CACHE[interpret]
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _fn(x2d, q4, scale, layer):
        return _stacked_core(x2d, q4, scale, layer, interpret=interpret)

    core = custom_partitioning(_fn)

    def _spec(info, rank):
        s = getattr(info, "sharding", None)
        spec = tuple(s.spec) if s is not None else ()
        return spec + (None,) * (rank - len(spec))

    def infer(mesh, arg_infos, result_info):
        x0 = _spec(arg_infos[0], 2)[0]
        col = _spec(arg_infos[1], 3)[2]
        return NamedSharding(mesh, P(x0, col))

    def partition(mesh, arg_infos, result_infos):
        x0 = _spec(arg_infos[0], 2)[0]
        col = _spec(arg_infos[1], 3)[2]

        def ns(*spec):
            return NamedSharding(mesh, P(*spec))

        def lower(x, q4, scale, layer):
            return _stacked_core(x, q4, scale, layer, interpret=interpret)

        args = (ns(x0, None), ns(None, None, col), ns(None, None, col),
                ns(None))
        return mesh, lower, ns(x0, col), args

    core.def_partition(infer_sharding_from_operands=infer,
                       partition=partition,
                       sharding_rule="m k, l w n, l g n, a -> m n")
    _STACKED_PART_CACHE[interpret] = core
    return core


def _get_stacked(interpret: bool):
    """custom_vmap-wrapped stacked core: batched (vmapped) calls with a
    shared layer index flatten the batch into M (same rationale as
    _get_core — Pallas's default batching rule would re-stream weights
    per batch slot)."""
    if interpret in _STACKED_CACHE:
        return _STACKED_CACHE[interpret]
    from jax import custom_batching

    part = _get_stacked_partitioned(interpret)

    def _call(x2d, q4, scale, layer):
        return part(x2d, q4, scale, layer)

    core = custom_batching.custom_vmap(_call)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, q4, scale, layer):  # noqa: ANN001
        xb, qb, sb, lb = in_batched
        if qb or sb or lb:  # per-example weights/layers: no flattening
            out = jax.lax.map(
                lambda i: core(x[i] if xb else x,
                               q4[i] if qb else q4,
                               scale[i] if sb else scale,
                               layer[i] if lb else layer),
                jnp.arange(axis_size))
            return out, True
        B, M, K = x.shape
        y = core(x.reshape(B * M, K), q4, scale, layer)
        return y.reshape(B, M, -1), True

    _STACKED_CACHE[interpret] = core
    return core


class Stacked4(NamedTuple):
    """A stacked int4 layer weight + the (traced) layer index, passed
    through the transformer scan body in place of a sliced weight dict so
    _dense routes to qdense4_stacked (see _qdense4_pallas_stacked)."""

    q4: jnp.ndarray      # [L, K/8, N] packed words
    scale: jnp.ndarray   # [L, G, N]
    layer: jnp.ndarray   # scalar int32


def qdense4_stacked(x: jnp.ndarray, w: Stacked4,
                    b: Optional[jnp.ndarray] = None,
                    out_dtype=None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [.., K] @ stacked packed-int4 weights, layer selected in-kernel.

    Off-TPU (and under TP's blocked 4-D layout, which keeps the sliced
    path) this falls back to slicing + qdense4 — identical numerics."""
    if interpret is None:
        if jax.default_backend() != "tpu":
            if not FORCE_INTERPRET:
                qw = {"q4": jnp.take(w.q4, w.layer, axis=0),
                      "scale": jnp.take(w.scale, w.layer, axis=0)}
                return qdense4_xla(x, qw, b, out_dtype=out_dtype)
            interpret = True
        else:
            interpret = False
    shape = x.shape
    N = w.q4.shape[-1]
    lay = jnp.asarray(w.layer, jnp.int32).reshape(1)
    y = _get_stacked(bool(interpret))(x.reshape(-1, shape[-1]), w.q4,
                                      w.scale, lay)
    y = y.astype(out_dtype or x.dtype).reshape(shape[:-1] + (N,))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


_PART_CACHE: dict = {}


def _get_partitioned(interpret: bool):
    """custom_partitioning-wrapped core (q4/scale in blocked 3-D form).

    XLA SPMD cannot auto-partition a Pallas custom call — without this it
    would all-gather the operands and run the full kernel on every chip.
    The partition rules give the kernel Megatron semantics under TP
    (sharding.quantized_target_param_specs4):
    - q4 sharded on N (column-parallel — wq/wk/wv/w_gate/w_up/lm_head):
      each shard runs the kernel on its own output columns; no collective,
      per-element results bit-identical to unsharded.
    - q4 sharded on the leading BLOCK axis (row-parallel — wo/w_down,
      packed with pack_w4 blocks=t): each shard holds a self-contained
      packing of a contiguous K range, x is sharded on K to match, and one
      f32 psum combines the shard partials. Activation scales are then
      per-(row, shard) — finer than unsharded, so row-parallel outputs
      agree to f32 tolerance rather than bitwise (same caveat as any TP
      system's reduction order).
    - unsharded/replicated: plain local call (single-chip path unchanged).

    Envelope: tp must divide num_kv_heads (the engine's own TP bound — the
    KV cache shards by kv head). With tp > num_kv_heads the partitioner
    propagates a kv-head-replicated activation tiling (e.g. 4-way split ×
    2-way replicated on an 8-way mesh) into the custom call, which cannot
    be parsed into mesh-axis PartitionSpecs
    (tests/test_quant4_tp.py::test_int4_target_engine_tp8_pallas_interpret).
    """
    if interpret in _PART_CACHE:
        return _PART_CACHE[interpret]
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _core_fn(x2d, q4, scale):
        return _qdense4_core(x2d, q4, scale, interpret=interpret)

    core = custom_partitioning(_core_fn)

    def _spec(info, rank):
        s = getattr(info, "sharding", None)
        spec = tuple(s.spec) if s is not None else ()
        return spec + (None,) * (rank - len(spec))

    def infer(mesh, arg_infos, result_info):
        x0 = _spec(arg_infos[0], 2)[0]
        wspec = _spec(arg_infos[1], 3)
        col = wspec[2] if wspec[0] is None else None
        return NamedSharding(mesh, P(x0, col))

    def partition(mesh, arg_infos, result_infos):
        x0 = _spec(arg_infos[0], 2)[0]
        wspec = _spec(arg_infos[1], 3)
        row, col = wspec[0], wspec[2]

        def ns(*spec):
            return NamedSharding(mesh, P(*spec))

        if row is not None:
            def lower(x, q4, scale):
                return jax.lax.psum(
                    _qdense4_core(x, q4, scale, interpret=interpret), row)
            args = (ns(x0, row), ns(row, None, None), ns(row, None, None))
            out = ns(x0, None)
        else:
            def lower(x, q4, scale):
                return _qdense4_core(x, q4, scale, interpret=interpret)
            args = (ns(x0, None), ns(None, None, col), ns(None, None, col))
            out = ns(x0, col)
        return mesh, lower, out, args

    core.def_partition(infer_sharding_from_operands=infer,
                       partition=partition,
                       sharding_rule="m k, b w n, b g n -> m n")
    _PART_CACHE[interpret] = core
    return core


_CORE_CACHE: dict = {}


def _get_core(interpret: bool):
    """custom_vmap-wrapped core: a vmapped call (the engine's batched
    serving rounds) flattens the batch into M instead of letting Pallas
    prepend a grid dimension — the naive batching rule re-streams every
    weight block once PER BATCH SLOT (measured 52.5 ms vs 27 ms for the
    B=8 round, tools/probe_int4_b8.py). Row independence makes the
    flatten bit-exact. The inner call goes through _get_partitioned so
    sharded weights partition instead of gathering."""
    if interpret in _CORE_CACHE:
        return _CORE_CACHE[interpret]
    from jax import custom_batching

    part = _get_partitioned(interpret)

    def _call(x2d, q4, scale):
        if q4.ndim == 2:                       # blocks=1 stored layout
            q4, scale = q4[None], scale[None]
        return part(x2d, q4, scale)

    core = custom_batching.custom_vmap(_call)

    @core.def_vmap
    def _rule(axis_size, in_batched, x, q4, scale):  # noqa: ANN001
        xb, qb, sb = in_batched
        if qb or sb:  # per-example weight banks: no flattening possible
            out = jax.lax.map(
                lambda i: core(x[i] if xb else x,
                               q4[i] if qb else q4,
                               scale[i] if sb else scale),
                jnp.arange(axis_size))
            return out, True
        B, M, K = x.shape
        y = core(x.reshape(B * M, K), q4, scale)
        return y.reshape(B, M, -1), True

    _CORE_CACHE[interpret] = core
    return core


def qdense4(x: jnp.ndarray, qw: dict, b: Optional[jnp.ndarray] = None,
            out_dtype=None,
            interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [.., K] @ packed-int4 weights -> [.., N].

    Pallas kernel on TPU; qdense4_xla elsewhere (same numerics).
    interpret=True forces the kernel through the Pallas interpreter
    (kernel-logic tests on CPU). Setting the module flag
    FORCE_INTERPRET=True routes even interpret=None calls (the engine's)
    through the interpreted kernel off-TPU, so tests can exercise the
    custom_vmap + custom_partitioning + scan composition on a CPU mesh."""
    if interpret is None:
        if jax.default_backend() != "tpu":
            if not FORCE_INTERPRET:
                return qdense4_xla(x, qw, b, out_dtype=out_dtype)
            interpret = True
        else:
            interpret = False
    shape = x.shape
    N = qw["q4"].shape[-1]
    y = _get_core(bool(interpret))(x.reshape(-1, shape[-1]), qw["q4"],
                                   qw["scale"])
    y = y.astype(out_dtype or x.dtype).reshape(shape[:-1] + (N,))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Tree-level conversion (mirrors ops/quant.py coverage exactly)
# ---------------------------------------------------------------------------

from .quant import _DRAFT_QUANT_KEYS, _QUANT_KEYS  # shared leaf names


def _packable(w, group: int) -> bool:
    K = w.shape[-2]
    return K % 8 == 0  # 8 nibbles/word; group auto-adapts via _eff_group


def quantize_draft_params4(dparams: dict, group: int = GROUP) -> dict:
    """int4-pack every matrix ops/quant.quantize_draft_params would int8;
    matrices whose contraction dim can't group-pack stay bf16."""
    out = dict(dparams)
    layers = []
    for lp in dparams["layers"]:
        nlp = dict(lp)
        for k in _DRAFT_QUANT_KEYS:
            if k in nlp and not isinstance(nlp[k], dict) \
                    and _packable(nlp[k], group):
                nlp[k] = pack_w4(nlp[k], group)
        layers.append(nlp)
    out["layers"] = layers
    if "fc" in out and not isinstance(out["fc"].get("w"), dict) \
            and _packable(out["fc"]["w"], group):
        fc = dict(out["fc"])
        fc["w"] = pack_w4(fc["w"], group)
        out["fc"] = fc
    if "lm_head" in out and not isinstance(out["lm_head"], dict) \
            and _packable(out["lm_head"], group):
        out["lm_head"] = pack_w4(out["lm_head"], group)
    return out


def _pack_w4_host(w, group: int = GROUP, blocks: int = 1) -> dict:
    """Host (numpy) packing for 2-D [K, N] or stacked [L, K, N] weights —
    same math as pack_w4/vmap(pack_w4); avoids staging fp32 copies of a
    multi-GB tree on device (see quant.quantize_target_params).
    blocks > 1 emits pack_w4's TP layout with a block axis inserted before
    the word axis: [.., blocks, K/(8b), N]."""
    wf = np.asarray(w, np.float32)
    K, N = wf.shape[-2], wf.shape[-1]
    if K % (8 * blocks):
        raise ValueError(f"int4 packing needs 8*blocks={8*blocks} | K={K}")
    Kb = K // blocks
    group = _eff_group(Kb, group)
    lead = wf.shape[:-2]
    wg = wf.reshape(lead + (K // group, group, N))
    amax = np.max(np.abs(wg), axis=-2)
    scale = np.maximum(amax / 7.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(wg / scale[..., None, :]), -7, 7)
    nib = (q + 8.0).astype(np.uint8).reshape(lead + (blocks, Kb, N))
    b = (nib[..., : Kb // 2, :]
         | (nib[..., Kb // 2:, :] << 4)).astype(np.int32)
    b = b.reshape(lead + (blocks, Kb // 8, 4, N))
    words = (b[..., 0, :] | (b[..., 1, :] << 8) | (b[..., 2, :] << 16)
             | (b[..., 3, :] << 24)).astype(np.int32)
    if blocks == 1:
        return {"q4": words.reshape(lead + (K // 8, N)), "scale": scale}
    return {"q4": words,
            "scale": scale.reshape(lead + (blocks, K // group // blocks, N))}


# row-parallel keys: contraction (K) axis is the one TP shards, so these
# must be packed with blocks=tp (parallel/sharding.py row specs)
_ROW_PARALLEL_KEYS = ("wo", "w_down")


def quantize_target_params4(params: dict, group: int = GROUP,
                            tp: int = 1, fuse: bool = False) -> dict:
    """Weight-only int4 for a TARGET tree (stacked [L, K, N] layers +
    lm_head), on the host. Serving operating point: outputs match the int4
    target's own vanilla decode bit-for-bit, not the bf16 target's —
    same contract as quant.quantize_target_params.

    tp > 1 packs the row-parallel weights (wo/w_down) with blocks=tp so
    the tree shards under sharding.quantized_target_param_specs4 — each
    model-axis shard then owns a standalone packing of a contiguous K
    range (see pack_w4). tp=1 output is bit-identical to tp>1 run
    unsharded (K-ordered group accumulation either way).

    MoE expert banks quantize via an expert-axis FOLD (dense-dispatch
    decode only — transformer._mlp_moe): gate/up [L, E, H, F] become one
    stacked matmul weight [L, H, E·F] ("we_gate4"/"we_up4"); down
    [L, E, F, H] becomes [L, E·F, H] ("we_down4") — the router's combine
    weights are folded into the down-projection INPUT, so the single
    [M, E·F] × [E·F, H] matmul also performs the expert sum. Every expert
    streams exactly once per token (the dense-decode optimum) through the
    same stacked Pallas kernel as the dense layers. The N/K expert folds
    are expert-contiguous, so EP sharding splits on expert boundaries
    when E divides the mesh. Capacity dispatch keeps bf16/int8 banks
    (prefill/training mode — raise if combined with int4).

    fuse=True (tp==1 only): concatenate wq|wk|wv → one "wqkv" weight and
    w_gate|w_up → one "w_gateup" BEFORE packing — 7 kernel calls per
    layer become 4, and the per-call XLA glue the kernel cannot absorb
    (activation amax/round/clip quantization + rowsum precompute over the
    same x) runs once per input instead of per projection. Per-column
    kernel math is independent and K-group order unchanged, so fused
    outputs are BIT-IDENTICAL to unfused (tests/test_quant4.py). Not
    combined with TP: equal-N column shards of a concatenated qkv would
    split mid-projection."""
    if fuse and tp != 1:
        raise ValueError("fuse=True is a single-chip (tp=1) layout")
    out = dict(params)
    layers = dict(params["layers"])
    if fuse and "wq" in layers and not isinstance(layers["wq"], dict):
        wq, wk, wv = (layers.pop(k) for k in ("wq", "wk", "wv"))
        layers["wqkv"] = np.concatenate(
            [np.asarray(wq), np.asarray(wk), np.asarray(wv)], axis=-1)
        if "bq" in layers:
            layers["bqkv"] = np.concatenate(
                [np.asarray(layers.pop(k)) for k in ("bq", "bk", "bv")],
                axis=-1)
    if fuse and "w_gate" in layers and not isinstance(layers["w_gate"],
                                                      dict):
        layers["w_gateup"] = np.concatenate(
            [np.asarray(layers.pop("w_gate")),
             np.asarray(layers.pop("w_up"))], axis=-1)
    for k in _QUANT_KEYS + ("wqkv", "w_gateup"):
        if k in layers and not isinstance(layers[k], dict):
            blocks = tp if k in _ROW_PARALLEL_KEYS else 1
            layers[k] = _pack_w4_host(layers[k], group, blocks=blocks)
    if "we_gate" in layers and not isinstance(layers["we_gate"], dict):
        wg = np.asarray(layers.pop("we_gate"), np.float32)  # [L, E, H, F]
        wu = np.asarray(layers.pop("we_up"), np.float32)
        wd = np.asarray(layers.pop("we_down"), np.float32)  # [L, E, F, H]
        L, E, H, F = wg.shape
        fold_n = lambda w: np.ascontiguousarray(
            w.transpose(0, 2, 1, 3)).reshape(L, H, E * F)
        layers["we_gate4"] = _pack_w4_host(fold_n(wg), group)
        layers["we_up4"] = _pack_w4_host(fold_n(wu), group)
        layers["we_down4"] = _pack_w4_host(
            wd.reshape(L, E * F, H), group, blocks=tp)
    out["layers"] = layers
    if "lm_head" in out and not isinstance(out["lm_head"], dict):
        out["lm_head"] = _pack_w4_host(out["lm_head"], group)
    return out


# ---------------------------------------------------------------------------
# Quantization-aware training (straight-through, matches pack_w4 math)
# ---------------------------------------------------------------------------

def fake_quantize4_linear(w: jnp.ndarray, group: int = GROUP) -> jnp.ndarray:
    K, N = w.shape
    group = _eff_group(K, group)
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    dq = (jnp.clip(jnp.round(wf / scale), -7, 7) * scale).reshape(K, N)
    wf = wf.reshape(K, N)
    return (wf + jax.lax.stop_gradient(dq - wf)).astype(w.dtype)


def fake_quantize4_draft_params(dparams: dict, group: int = GROUP) -> dict:
    """STE int4 fake-quant over exactly quantize_draft_params4's coverage."""
    out = dict(dparams)
    if "layers" in out:
        layers = []
        for lp in out["layers"]:
            nlp = dict(lp)
            for k in _QUANT_KEYS:
                if k in nlp and not isinstance(nlp[k], dict) \
                        and _packable(nlp[k], group):
                    nlp[k] = fake_quantize4_linear(nlp[k], group)
            layers.append(nlp)
        out["layers"] = layers
    if "fc" in out and not isinstance(out["fc"].get("w"), dict) \
            and _packable(out["fc"]["w"], group):
        fc = dict(out["fc"])
        fc["w"] = fake_quantize4_linear(fc["w"], group)
        out["fc"] = fc
    if "lm_head" in out and not isinstance(out["lm_head"], dict) \
            and _packable(out["lm_head"], group):
        out["lm_head"] = fake_quantize4_linear(out["lm_head"], group)
    return out
