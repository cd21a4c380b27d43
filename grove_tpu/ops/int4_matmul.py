"""Fused int4-weight matmul: unpack + dequantize in VMEM, dot on the MXU.

Why a kernel: XLA materializes dot operands, so an int4 weight matrix
consumed as `dequant(wq)` would write the full bf16 kernel back to HBM
every call — erasing the 4x byte win that motivates int4 in the first
place. This kernel streams the PACKED int4 bytes into VMEM, unpacks and
dequantizes on the VPU, and feeds the MXU directly; neither the int4
values nor the bf16 weights ever exist in HBM.

Storage is packed int8 (`ops.quant.pack_int4`): the axon relay cannot
move `jnp.int4` arrays across jit boundaries (device_put recursion,
measured in `benchmarks/int4_probe.py`), and packed bytes carry the same
0.5 B/element. The pack pairs whole quantization GROUPS along K — packed
super-group p holds group 2p in the low nibbles and group 2p+1 in the
high nibbles — so one grid k-step unpacks into two contiguous (G, bn)
operands and issues two full K=G MXU dots; no sublane interleave.

Scale handling exploits group == nibble-plane: every weight element in a
nibble plane shares its scale row, so

    sum_k x[m,k] * (q4[k,n] * s[g,n])  ==  s[g,n] * sum_k x[m,k] * q4[k,n]

and the scale applies to the (bm, bn) dot OUTPUT tile — one VPU multiply
per plane instead of scaling the weights element-wise.

Used by `models.layers.Int4Dense`. Reference analogue: none — the
reference (ekazakos/grove) serves bf16 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_biased(p):
    """(G, bn) packed int8 -> (lo + 8, hi * 16) int8 nibble planes.

    All-int8 arithmetic: int8 lanes pack 4x denser on the VPU than the
    int32 round trip this used to take (measured: the decode proj stack
    was VPU-bound on the unpack, 313 GB/s effective while the int8
    attention stack streams at 728). On this chip Mosaic legalizes ONLY
    `andi`/`xori` on i8 vectors (probed: every shift, `muli`, `subi`,
    and `cmpi` fail, and i16 shifts fail too), so neither nibble can be
    moved to bit 0 in-register. Both planes therefore come out
    TRANSFORMED and the callers undo the transforms analytically:
      lo: (p & 15) ^ 8 == lo + 8 (in 0..15);
          x @ lo == x @ (lo+8) - 8 * rowsum(x) — a correction over the
          tiny activation tile instead of the weight stream.
      hi: p & -16 == hi << 4 == 16 * hi as a signed i8 (sign bit stays
          put; hi in -8..7 so 16*hi in -128..112 fits) — the MXU eats
          the 16x and the group scale absorbs the exact 2^-4."""
    lo_b = jnp.bitwise_xor(jnp.bitwise_and(p, jnp.int8(15)), jnp.int8(8))
    hi16 = jnp.bitwise_and(p, jnp.int8(-16))
    return lo_b, hi16


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, k_blocks: int,
            group: int, supers: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    # python-unrolled over the block's super-groups: the x lane slices
    # must be STATIC (dynamic lane slicing is unsupported in Mosaic)
    for t in range(supers):
        x = x_ref[:, t * 2 * group:(t + 1) * 2 * group]   # (bm, 2G)
        lo_b, hi16 = _unpack_biased(w_ref[t * group:(t + 1) * group, :])
        xl = x[:, :group]
        a = jax.lax.dot_general(xl, lo_b.astype(x.dtype), dn,
                                preferred_element_type=jnp.float32)
        # un-bias the low plane: x @ lo == x @ (lo+8) - 8 * rowsum(x)
        a -= 8.0 * jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        b = jax.lax.dot_general(x[:, group:], hi16.astype(x.dtype), dn,
                                preferred_element_type=jnp.float32)
        s = s_ref[t]                                 # (2, bn) group rows
        # s/16 undoes the hi<<4 packing exactly (power-of-two in f32)
        acc_ref[...] += a * s[0:1] + b * (s[1:2] * 0.0625)

    @pl.when(kk == k_blocks - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_a8(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, *,
               k_blocks: int, group: int, supers: int):
    """W4A8 variant: int8 activations x (int4 -> int8) weights ride the
    MXU's int8 path, int32 accumulation per dot (exact: |acc per group|
    <= 128*127*7 ~ 1.1e5 << 2^31; Mosaic rejects f32 acc with int
    operands — "Expected float lhs"), converted to f32 for the group
    scale. Per-token activation scales apply once at the final store."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    for t in range(supers):
        x = x_ref[:, t * 2 * group:(t + 1) * 2 * group]   # (bm, 2G) int8
        lo_b, hi16 = _unpack_biased(w_ref[t * group:(t + 1) * group, :])
        xl = x[:, :group]
        # biased-plane dot (values 0..15: |acc| <= 128*127*15 << 2^31),
        # un-biased exactly in int32: x @ lo == x @ (lo+8) - 8*rowsum(x)
        a = jax.lax.dot_general(xl, lo_b, dn,
                                preferred_element_type=jnp.int32)
        a -= 8 * jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
        # hi plane rides as 16*hi (|acc| <= 128*127*128 ~ 2.1e6, exact
        # in f32 too); the 2^-4 folds into the scale multiply
        b = jax.lax.dot_general(x[:, group:], hi16, dn,
                                preferred_element_type=jnp.int32)
        s = s_ref[t]                                 # (2, bn) group rows
        acc_ref[...] += (a.astype(jnp.float32) * s[0:1]
                         + b.astype(jnp.float32) * (s[1:2] * 0.0625))

    @pl.when(kk == k_blocks - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * sx_ref[...]).astype(o_ref.dtype)


_VMEM_BUDGET = 12 * 2**20  # 16 MB scoped limit minus headroom


def _vmem_bytes(bm: int, bn: int, group: int, x_bytes: int,
                out_bytes: int, supers: int = 1) -> int:
    """Model the kernel's scoped-VMEM footprint at a (bm, bn) blocking
    spanning `supers` super-groups of K per grid cell.

    Double-buffered operand/out blocks + the f32 acc scratch + the
    kernel's live temporaries: the two (bm, bn) per-plane dot results
    (int32 or f32) coexist with the acc, and the unpacked (group, bn)
    int32 nibble planes with them. Calibrated against a real failure:
    bm 2048 / bn 512 / f32 out was rejected at 17.05M over the 16M
    scoped limit."""
    io = 2 * (bm * supers * 2 * group * x_bytes   # x block
              + supers * group * bn               # packed weight block
              + bm * 4 + supers * 2 * bn * 4      # sx + scale rows
              + bm * bn * out_bytes)              # out block
    acc = bm * bn * 4
    temps = 2 * bm * bn * 4 + 2 * group * bn * 4
    return io + acc + temps


def _pick_supers_bn(k_steps: int, bm: int, n: int, group: int,
                    x_bytes: int, out_bytes: int) -> tuple[int, int]:
    """(supers, bn) for SMALL-m (decode) shapes: minimize grid cells.

    At m <= 64 the per-cell compute is sub-microsecond, so the step is
    dominated by per-grid-cell fixed costs (DMA issue latency), not
    bandwidth: the b16 decode proj stack measured 292 GB/s vs the 717
    the attention stack streams at (benchmarks/decode_breakdown.py).
    Spanning `supers` 2G-row super-groups of K per cell cuts the cell
    count and fattens each weight DMA (512 KB -> 4 MB at K=N=4096).
    supers must divide k_steps, so the joint search matters when
    k_steps is prime (LLaMA's down-proj: K=11008 -> 43 steps takes
    supers=43 x bn=512, the whole K in 2.8 MB blocks). Fewest cells
    wins; ties prefer fatter weight blocks."""
    best = None
    sdivs = [d for d in range(1, k_steps + 1) if k_steps % d == 0]
    bn = min(8192, n)
    bns = []
    while bn >= 128:
        if n % bn == 0 and bn % 128 == 0:
            bns.append(bn)
        bn -= 128
    for s in sdivs:
        for b in bns:
            if _vmem_bytes(bm, b, group, x_bytes, out_bytes, s) \
                    > _VMEM_BUDGET:
                continue
            cells = (n // b) * (k_steps // s)
            wbytes = s * group * b
            key = (cells, -wbytes)
            if best is None or key < best[0]:
                best = (key, s, b)
    if best is None:
        return 1, 128
    return best[1], best[2]


def _pick_blocks(m: int, n: int, group: int, x_bytes: int, out_bytes: int,
                 block_m: int, block_n: int,
                 k_steps: int = 1) -> tuple[int, int, int]:
    """Auto blocking: big M-blocks at prefill shapes, tiny at decode,
    shrunk to the scoped-VMEM budget. Returns (bm, bn, supers) where
    `supers` super-groups of K ride in each grid cell (see
    `_pick_supers_bn`; 1 for big-m shapes and explicit overrides).

    The packed weight block (group, bn) is re-streamed from HBM once per
    M-block, so small M-blocks turn prefill weight-read-bound: at
    M ~ 10k / block_m 256 the full kernel streams 39x (measured 74-136
    TF/s); block_m 2048 cuts that to 5x (196-211 TF/s, the MXU int8
    ceiling for this unpack pattern). bm dominates weight traffic and bn
    doesn't, so VMEM pressure sheds bn first (>=128), then halves bm.
    Explicit block_m/block_n override the heuristic but still shrink
    under the budget; m < 256 keeps the old exact-fit behavior."""
    bm = min(block_m or (2048 if m > 256 else 256), max(8, m))
    if not block_n and bm <= 64:
        supers, bn = _pick_supers_bn(k_steps, bm, n, group, x_bytes,
                                     out_bytes)
        return bm, bn, supers
    bn = block_n or _block_n(n, m)
    assert n % bn == 0, (n, bn)
    while _vmem_bytes(bm, bn, group, x_bytes, out_bytes) > _VMEM_BUDGET:
        nbn = bn - 128
        while nbn >= 128 and n % nbn:
            nbn -= 128
        if nbn >= 128:
            bn = nbn
        elif bm > 256:
            bm //= 2
        else:
            break
    return bm, bn, 1


def _block_n(n: int, m: int, cap: int = 512) -> int:
    """Largest multiple-of-128 divisor of n, capped (11008 -> 256).

    Decode shapes (tiny m) raise the cap: with m <= 32 the acc tile is
    small, and small n-blocks leave the step dominated by per-grid-cell
    overhead (measured 156 GB/s at bn=256 vs the ~670 GB/s the full
    decode step achieves; bn=5504 cuts the 688-cell grid to 32 cells).
    """
    if m <= 32:
        cap = 8192
    bn = min(cap, n)
    while bn > 128 and (n % bn or bn % 128):
        bn -= 128
    return bn


def _kernel_requant(w_ref, m_ref, o_ref, *, group: int):
    # i32 unpack: the requant math is i32 anyway (mult + shift), so the
    # i8-only legalization constraint doesn't bite here
    p32 = w_ref[...].astype(jnp.int32)
    lo = jnp.left_shift(p32, 28) >> 28
    hi = p32 >> 4
    m = m_ref[0]                                     # (2, bn) int32 mults
    o_ref[:group] = ((lo * m[0:1] + 128) >> 8).astype(jnp.int8)
    o_ref[group:] = ((hi * m[1:2] + 128) >> 8).astype(jnp.int8)


@jax.jit
def int4_requant_int8(wp, mult):
    """Packed int4 wp (K/2, N) -> per-channel int8 view (K, N) in one
    bandwidth-bound pass.

    mult (K/G, N) int32 is the fixed-point group->channel requant
    multiplier round(256 * s_g / s8) (see `Int4Dense`): the kernel
    computes q8 = (q4 * mult + 128) >> 8 per nibble plane. Exists
    because the same requant as an XLA op chain compiles to
    shift/stack/pad fusions materializing padded (sg2, 2, G, N) tiles —
    measured 99 ms of shift/slice/add fusions + 45 ms of pads per
    32-layer b16 prefill (benchmarks/prefill_breakdown.py); this kernel
    reads the packed bytes and writes the int8 view once."""
    kh, n = wp.shape
    k_steps = mult.shape[0] // 2
    group = kh // k_steps
    assert group % 128 == 0, group
    bn = _block_n(n, m=2**30)  # plain cap-512 divisor choice
    kernel = functools.partial(_kernel_requant, group=group)
    return pl.pallas_call(
        kernel,
        grid=(k_steps, n // bn),
        in_specs=[
            pl.BlockSpec((group, bn), lambda p, j: (p, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bn), lambda p, j: (p, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * group, bn), lambda p, j: (p, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * kh, n), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(wp, mult.reshape(k_steps, 2, n))


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int4_matmul(x, wp, scale, block_m: int = 0, block_n: int = 0):
    """x (M, K) bf16/f32 @ packed wp (K/2, N) int8 with scale (K/G, N)
    f32 -> (M, N).

    Requires K % (2G) == 0 with G = K // scale.shape[0] a multiple of 128
    (each nibble plane IS a quantization group). M is padded to block_m
    internally; block_m=0 / block_n=0 pick measured-good defaults
    (`_block_m` / `_block_n`).
    """
    m, k = x.shape
    kh, n = wp.shape
    assert k == 2 * kh, (x.shape, wp.shape)
    groups = scale.shape[0]
    assert k % groups == 0 and groups % 2 == 0, (k, groups)
    group = k // groups
    assert group % 128 == 0, ("int4 nibble plane must be lane-aligned",
                              group)

    xb = jnp.dtype(x.dtype).itemsize
    k_steps = groups // 2
    block_m, block_n, supers = _pick_blocks(m, n, group, xb, xb, block_m,
                                            block_n, k_steps)
    pad_m = (-m) % block_m
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    k_blocks = k_steps // supers

    kernel = functools.partial(_kernel, k_blocks=k_blocks, group=group,
                               supers=supers)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, n // block_n, k_blocks),
        in_specs=[
            pl.BlockSpec((block_m, supers * 2 * group),
                         lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((supers * group, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((supers, 2, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(x, wp, scale.astype(jnp.float32).reshape(k_steps, 2, n))
    return out[:m] if pad_m else out


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "out_dtype"))
def int4_matmul_a8(xq, sx, wp, scale, block_m: int = 0,
                   block_n: int = 0, out_dtype=jnp.bfloat16):
    """W4A8: xq (M, K) int8 with per-token scales sx (M, 1) f32 @
    packed wp (K/2, N) int8 with group scales scale (K/G, N) f32 ->
    (M, N).

    y ~= (sx * xq) @ dequant(wp): both matmul operands are integer, so
    the dot runs at the MXU's int8 rate; scales apply to the f32
    accumulator (group scale per nibble plane, token scale at the
    store). Same blocking contract as `int4_matmul`."""
    m, k = xq.shape
    kh, n = wp.shape
    assert k == 2 * kh and sx.shape == (m, 1), (xq.shape, wp.shape,
                                                sx.shape)
    groups = scale.shape[0]
    assert k % groups == 0 and groups % 2 == 0, (k, groups)
    group = k // groups
    assert group % 128 == 0, group

    k_steps = groups // 2
    block_m, block_n, supers = _pick_blocks(
        m, n, group, 1, jnp.dtype(out_dtype).itemsize, block_m, block_n,
        k_steps)
    pad_m = (-m) % block_m
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)))
    mp = m + pad_m
    k_blocks = k_steps // supers

    kernel = functools.partial(_kernel_a8, k_blocks=k_blocks, group=group,
                               supers=supers)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, n // block_n, k_blocks),
        in_specs=[
            pl.BlockSpec((block_m, supers * 2 * group),
                         lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((supers * group, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((supers, 2, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xq, sx.astype(jnp.float32), wp,
      scale.astype(jnp.float32).reshape(k_steps, 2, n))
    return out[:m] if pad_m else out
