"""Pallas TPU kernel for the FMM near-field (P2P) pass.

Replaces the reference's shared-memory/subwarp P2P kernels
(fmm_p2p3_kdtree*, fmm_cart3_kdtree.cuh:767-1132) with a TPU gather kernel:
one grid program per TARGET leaf walks its partner list, double-buffering
source leaf blocks from HBM into VMEM while the VPU evaluates the softened
pairwise kernel on [C, C] tiles.  Accumulation stays in registers; each
output block is written exactly once (no atomics — the TPU-native answer to
the reference's myAtomicAdd scatter).

Partner lists: degrees vary per leaf, so the CSR row pointer [G+1] rides in
SMEM via scalar prefetch, while the (large) padded partner table [G, Dmax]
stays in HBM and each program DMAs only its own row into SMEM scratch.

Layouts: targets as row blocks [G, C, 8] (coordinate columns), sources as
SoA blocks [G, 8, C] (coordinate rows) — both padded so the pairwise
broadcast (C,1)-(1,C) hits natural tilings; C must be a multiple of 128.
Padded slots sit at FAR so their weights underflow to exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _p2p_kernel(row_ptr, tgt_ref, col_hbm, soa_hbm, out_ref,
                colbuf, colsem, bufs, sems, *, dim: int, eps2: float):
    g = pl.program_id(0)
    deg = row_ptr[g + 1] - row_ptr[g]

    cp = pltpu.make_async_copy(col_hbm.at[g], colbuf, colsem)
    cp.start()
    cp.wait()
    # colbuf is [1, Dmax] in SMEM; index as colbuf[0, k]

    tgt = tgt_ref[0]                                   # [C, 8]
    C = tgt.shape[0]
    tcols = [tgt[:, a:a + 1] for a in range(dim)]      # (C,1) each

    NBUF = 16  # deep DMA ring: the blocks are small (~4 KB), so many must
    #            be in flight to hide HBM latency

    def dma(slot, k):
        return pltpu.make_async_copy(
            soa_hbm.at[colbuf[0, k]], bufs.at[slot], sems.at[slot])

    def warm(k, _):
        @pl.when(k < deg)
        def _():
            dma(jax.lax.rem(k, NBUF), k).start()
        return 0

    jax.lax.fori_loop(0, NBUF, warm, 0)

    def body(k, carry):
        slot = jax.lax.rem(k, NBUF)
        dma(slot, k).wait()
        s = bufs[slot]                                 # [8, C]
        dist2 = jnp.full((C, C), eps2, jnp.float32)
        ds = []
        for a in range(dim):
            da = tcols[a] - s[a:a + 1, :]              # (C, C)
            ds.append(da)
            dist2 = dist2 + da * da
        inv = 1.0 / dist2
        w = inv * jax.lax.rsqrt(dist2) if dim == 3 else inv
        out = tuple(c + jnp.sum(ds[a] * w, axis=1, keepdims=True)
                    for a, c in enumerate(carry))

        # refill this slot only after its block has been consumed
        @pl.when(k + NBUF < deg)
        def _():
            dma(slot, k + NBUF).start()

        return out

    init = tuple(jnp.zeros((C, 1), jnp.float32) for _ in range(dim))
    acc = jax.lax.fori_loop(0, deg, body, init)
    cols = list(acc) + [jnp.zeros((C, 8 - dim), jnp.float32)]
    out_ref[0] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("dim", "eps2"))
def p2p_leaf_pairs(pos_rows: jax.Array, pos_soa: jax.Array,
                   row_ptr: jax.Array, col2d: jax.Array,
                   dim: int, eps2: float) -> jax.Array:
    """Near-field accelerations on padded leaf blocks.

    pos_rows: [G, C, 8] targets; pos_soa: [G, 8, C] sources;
    row_ptr: [G+1] int32 degrees CSR; col2d: [G, Dmax] int32 partner leaf
    ids (row g valid for the first row_ptr[g+1]-row_ptr[g] entries); it is
    reshaped to [G, 1, Dmax] so row DMAs slice the untiled leading dim.
    Returns [G, C, 8] (coordinate columns 0..dim-1 hold the field).
    """
    G, C, _ = pos_rows.shape
    Dmax = col2d.shape[1]
    col3d = col2d.reshape(G, 1, Dmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, 8), lambda g, rp: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # col2d: DMA rows to SMEM
            pl.BlockSpec(memory_space=pltpu.HBM),  # sources: DMA to VMEM
        ],
        out_specs=pl.BlockSpec((1, C, 8), lambda g, rp: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, Dmax), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((16, 8, C), jnp.float32),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p2p_kernel, dim=dim, eps2=float(eps2)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, C, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(row_ptr, pos_rows, col3d, pos_soa)
