"""Pallas TPU kernel: axis-aligned windowed 1-D linear resample (batched).

The workhorse of the gather-free LU affine augmentation
(data/augment._affine_lu): each triangular-warp pass resamples a volume
along one axis at affinely-varying source positions

    out[x] = Σ_{d=−K..K+1} hat(rel(x) − d) · vol[x + d·e_axis],
    rel(x) = Σ_b cdelta_b · (x_b − center_b)

XLA lowers the tap loop to ~2K+2 materialized shifted copies — measured
~12 ms per pass over 33 × (128,128,64) volumes on v5e *independent of tap
count* (HBM-bound on the staged copies).  This kernel stages one
(axis-extent + 2K+1, block, lanes) tile of the symmetric-padded volume in
VMEM and accumulates every tap from there: one HBM read + one write per
element.

Semantics match data/augment._resample_axis_windowed: identical tap order,
f32 accumulation, same hat weights; parity-tested against it (the two may
differ in the last ulp where XLA fuses mul+add differently).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _resample_kernel(cd_ref, vol_ref, out_ref, rel_ref, acc_ref, *,
                     axis: int, window: int, center: tuple, block: int,
                     extent: tuple):
    """One (volume, block) program.  vol_ref is the symmetric-padded block
    (padded by (window, window+1) along `axis`); out_ref the unpadded block.
    cd_ref: the full (V, 3) cdelta table (cdelta = coefs − e_axis) — Mosaic
    requires whole-array blocks for shapes this small.  rel/acc live in VMEM
    scratch and every tap accumulates in place — a fully unrolled value-level
    loop kept ~2K+2 block-sized temporaries live on the Mosaic stack and blew
    the scoped-VMEM limit."""
    D, H, W = extent  # logical (unpadded) block extent
    v = pl.program_id(0)
    b = pl.program_id(1)
    f32 = jnp.float32
    cd = cd_ref[pl.ds(v, 1), :]  # (1, 3) row for this volume

    # rel over the output block; the blocked dim's iota is offset by b·block
    shape = (D, H, W)
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(f32) - center[0]
    gj = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(f32) - center[1]
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(f32) - center[2]
    blocked_dim = 1 if axis != 1 else 0  # spatial dim carrying the grid blocks
    off = (b * block).astype(f32)
    if blocked_dim == 0:
        gi = gi + off
    else:
        gj = gj + off
    rel_ref[...] = cd[0, 0] * gi + cd[0, 1] * gj + cd[0, 2] * gk

    acc_ref[...] = jnp.zeros(shape, f32)
    taps = list(range(-window, window + 2))
    CH = 1  # taps per value-level chunk.  CH=4 with 32-wide blocks blows the
    #        16 MB scoped-VMEM stack; CH=4 with 16-wide blocks fits but loses
    #        to this config on net (41.0 vs 35.6 ms for the 5-pass affine at
    #        33 volumes) — the acc_ref round trip is cheaper than the lost
    #        block width.
    for c0 in range(0, len(taps), CH):
        rel = rel_ref[...]
        part = None
        for d in taps[c0:c0 + CH]:
            s = d + window
            if axis == 0:
                shifted = vol_ref[0, s:s + D, :, :]
            elif axis == 1:
                shifted = vol_ref[0, :, s:s + H, :]
            else:
                shifted = vol_ref[0, :, :, s:s + W]
            w = jnp.maximum(0.0, 1.0 - jnp.abs(rel - d))
            t = w * shifted
            part = t if part is None else part + t
        acc_ref[...] += part
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _resample_kernel_v2(cd_ref, vol_ref, out_ref, rel_ref, acc_ref, *,
                        axis: int, window: int, span: int, center: tuple,
                        extent: tuple):
    """Dynamic-tap-base variant (r5): one (volume, block0, block1) program.

    The static tap window must cover the WORST-CASE displacement over the
    whole parameter box (2·window+2 taps), but within one output tile rel
    varies by only Σ|cdelta_b|·tile_extent_b — so at most `span` ≪ 2W+2
    adjacent taps carry nonzero hat weight.  This kernel computes the tile's
    runtime tap base d_lo = floor(min rel) and PREDICATES each static tap on
    d ∈ [d_lo, d_lo + span): skipped taps cost one scalar branch instead of
    a block-sized FMA + accumulator round trip — the v1 kernel's bound was
    exactly that per-tap VMEM traffic.  Static slices only (Mosaic rejects
    dynamic slices it cannot bounds-prove, and its dynamic roll rejects
    unaligned shapes), so the `axis` dim is never grid-blocked; the OTHER
    non-lane dims are blocked at 32 to keep the tile's rel range — and with
    it `span` — small.  ~1.75× fewer executed taps at the live affine
    geometry (79 of 138)."""
    e0, e1, e2 = extent  # out tile extent
    v, b0, b1 = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    f32 = jnp.float32
    cd = cd_ref[pl.ds(v, 1), :]  # (1, 3)

    shape = (e0, e1, e2)
    gi = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + b0 * e0
          ).astype(f32) - center[0]
    gj = (jax.lax.broadcasted_iota(jnp.int32, shape, 1) + b1 * e1
          ).astype(f32) - center[1]
    gk = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(f32) - center[2]
    rel_ref[...] = cd[0, 0] * gi + cd[0, 1] * gj + cd[0, 2] * gk
    # d ranges over [-window, window+1]; clamp so d_lo+span-1 <= window+1
    d_lo = jnp.clip(jnp.floor(jnp.min(rel_ref[...])),
                    -window, window + 2 - span).astype(jnp.int32)

    acc_ref[...] = jnp.zeros(shape, f32)
    for d in range(-window, window + 2):  # static taps, runtime-predicated

        @pl.when(jnp.logical_and(d >= d_lo, d < d_lo + span))
        def _tap(d=d):
            rel = rel_ref[...]
            w = jnp.maximum(0.0, 1.0 - jnp.abs(rel - float(d)))
            s = d + window
            if axis == 0:
                shifted = vol_ref[0, s:s + e0, :, :]
            elif axis == 1:
                shifted = vol_ref[0, :, s:s + e1, :]
            else:
                shifted = vol_ref[0, :, :, s:s + e2]
            acc_ref[...] += w * shifted

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _block_size(size: int, want: int = 32) -> int:
    bsz = min(want, size)
    while size % bsz:
        bsz //= 2
    return bsz


def resample_axis_windowed_batched(vols: jax.Array, axis: int,
                                   cdelta: jax.Array, center: tuple,
                                   window: int,
                                   span: int | None = None) -> jax.Array:
    """Batched windowed resample: vols (V, D, H, W) f32 or bf16, cdelta
    (V, 3) (= per-volume coefs − e_axis), static center/window.  Returns
    (V, D, H, W) in the input dtype.

    The kernel always ACCUMULATES taps in f32 scratch; bf16 volumes ride
    bf16 HBM/VMEM tiles (halving pad+DMA traffic for the bf16 augmentation
    pipeline) and only the store rounds.  Dtypes outside {f32, bf16} are
    upcast to f32 for the whole call.

    span: static bound on ACTIVE taps within one (32, 32, W) output tile
    (data/augment._lu_spans); when given and smaller than the full window,
    the v2 dynamic-tap-base kernel runs (grid (V, D/32, H/32)); otherwise
    the v1 full-window kernel (grid (V, blocks) over one dimension)."""
    V, D, H, W = vols.shape
    in_dtype = vols.dtype
    if in_dtype not in (jnp.float32, jnp.bfloat16):
        vols = vols.astype(jnp.float32)
    pad = [(0, 0)] * 4
    pad[1 + axis] = (window, window + 1)
    padded = jnp.pad(vols, pad, mode="symmetric")

    if span is not None and span < 2 * window + 2:
        # out tile: the `axis` dim rides whole (static tap slices need it);
        # lanes (dim 2) are never blocked; the remaining dim(s) of {0, 1}
        # block at 32 to keep each tile's rel range (and span) small
        out_block = [D, H, W]
        for dim in (0, 1):
            if dim != axis:
                out_block[dim] = _block_size([D, H][dim])
        in_block = list(out_block)
        in_block[axis] += 2 * window + 1  # the padded axis rides whole

        def in_idx(v, b0, b1):
            loc = [b0, b1, 0]
            loc[axis] = 0
            return (v, *loc)

        out = pl.pallas_call(
            partial(_resample_kernel_v2, axis=axis, window=window, span=span,
                    center=tuple(center), extent=tuple(out_block)),
            grid=(V, D // out_block[0], H // out_block[1]),
            in_specs=[pl.BlockSpec((V, 3), lambda v, b0, b1: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, *in_block), in_idx,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, *out_block),
                                   lambda v, b0, b1: (v, b0, b1, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, D, H, W), vols.dtype),
            scratch_shapes=[pltpu.VMEM(tuple(out_block), jnp.float32),
                            pltpu.VMEM(tuple(out_block), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=5 * span * V * D * H * W,
                bytes_accessed=2 * V * D * H * W * 4,
                transcendentals=0),
            interpret=_interpret(),
        )(cdelta.astype(jnp.float32), padded)
        return out.astype(in_dtype)

    # block the first non-axis spatial dim (dim 1 unless axis==0 → dim 2)
    blocked_dim = 1 if axis != 1 else 0   # 0 → D, 1 → H (spatial indices)
    sizes = [D, H, W]
    bsz = min(32, sizes[blocked_dim])
    while sizes[blocked_dim] % bsz:
        bsz //= 2
    n_blocks = sizes[blocked_dim] // bsz

    pshape = list(padded.shape[1:])
    in_block = pshape.copy()
    out_block = [D, H, W]
    in_block[blocked_dim] = bsz
    out_block[blocked_dim] = bsz

    def idx(v, b):
        loc = [0, 0, 0]
        loc[blocked_dim] = b
        return (v, *loc)

    in_spec = pl.BlockSpec((1, *in_block), idx, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, *out_block), idx, memory_space=pltpu.VMEM)
    cd_spec = pl.BlockSpec((V, 3), lambda v, b: (0, 0),
                           memory_space=pltpu.VMEM)

    extent = tuple(out_block)

    out = pl.pallas_call(
        partial(_resample_kernel, axis=axis, window=window,
                center=tuple(center), block=bsz, extent=extent),
        grid=(V, n_blocks),
        in_specs=[cd_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((V, D, H, W), vols.dtype),
        scratch_shapes=[pltpu.VMEM(tuple(out_block), jnp.float32),
                        pltpu.VMEM(tuple(out_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=5 * (2 * window + 2) * V * D * H * W,
            bytes_accessed=2 * V * D * H * W * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(cdelta.astype(jnp.float32), padded)
    return out.astype(in_dtype)
