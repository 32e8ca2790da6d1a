"""Pallas TPU kernel for the FMM near-field (P2P) pass.

Replaces the reference's shared-memory/subwarp P2P kernels
(fmm_p2p3_kdtree*, fmm_cart3_kdtree.cuh:767-1132) with a TPU-native
formulation exploiting the one resource GPUs lack: VMEM large enough to
hold EVERY source position at once.  The whole SoA position array
([Gb+1, 8, CB], ~34 MB at N=1M) is pinned in VMEM for the entire grid, so
each target block reads its partner source blocks directly from VMEM —
zero per-pair DMAs.

Dual-granularity lists (round 3): the MAC resolves the near field at
SUB-LEAF granularity (2^sub_depth sub-leaves per 128-lane block), so each
target block carries `nsub` independent partner lists, and each partner
entry packs a source block id with an `nsub`-bit sub-leaf mask in its top
bits.  Per grid step (one 128-lane target block):

  * its nsub rows of the partner table arrive via one SMEM DMA,
  * for each sub-leaf q (static unroll): a fori_loop over
    ceil(degree_q/KBLK) steps gathers K partner blocks (and their mask rows
    from a tiny 2^nsub x CB mask table) from the resident SoA and evaluates
    the softened kernel on one [Csub, K*CB] tile; masked-out lane groups
    (admissible sub-pairs handled by M2L) multiply to exactly zero,
  * the output block is written exactly once (no atomics — the TPU answer
    to the reference's myAtomicAdd scatter).

Padded slots sit at FAR so their weights underflow to exactly zero; padded
partner-table entries carry mask 0.  The self-pair diagonal contributes
d * w(eps) = 0 like the reference's self-interaction.  CB must be a
multiple of 128 (lane dim).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# partner blocks evaluated per loop step; env-overridable for tile-size
# experiments (scripts/p2p_bench.py).  Must divide the partner-table width
# quantum (128) or the Dmax % KBLK == 0 contract below breaks at runtime.
KBLK = int(os.environ.get("CO_P2P_KBLK", "8"))
if KBLK not in (1, 2, 4, 8, 16, 32, 64, 128):
    raise ValueError(
        f"CO_P2P_KBLK={KBLK} invalid: must be a power-of-two divisor of 128")


def _p2p_kernel(tgt_ref, col_hbm, degs_hbm, soa_ref, mtab_ref, out_ref,
                colbuf, degbuf, colsem, degsem, *, dim: int, eps2: float,
                nsub: int, mask_shift: int):
    g = pl.program_id(0)
    blkmask = (1 << mask_shift) - 1

    cp = pltpu.make_async_copy(col_hbm.at[g], colbuf, colsem)
    cp.start()
    dp = pltpu.make_async_copy(degs_hbm.at[g], degbuf, degsem)
    dp.start()
    cp.wait()
    dp.wait()
    # colbuf is [nsub, Dmax] in SMEM (packed blk | mask << mask_shift);
    # degbuf[0, q] holds sub-leaf q's partner count (SMEM-DMA'd per step:
    # a [Gsub+1] scalar-prefetch CSR costs Gsub*4 bytes of SMEM, which
    # overflows scalar memory past ~1M particles)

    # target block arrives flattened [CB*8]: a [.., CB, 8] operand would
    # put the 8-wide axis on the 128-lane minor and tile-pad it 16x in
    # HBM (8 GB of pure padding at N=10M); the in-kernel reshape is a
    # one-block relayout
    tgt = tgt_ref[0].reshape(-1, 8)                    # [CB, 8]
    CB = tgt.shape[0]
    Cs = CB // nsub
    outs = []
    for q in range(nsub):
        trows = tgt[q * Cs:(q + 1) * Cs]               # [Cs, 8]
        tcols = [trows[:, a:a + 1] for a in range(dim)]
        deg = degbuf[0, q]

        def body(k, carry, q=q, tcols=tcols):
            base = k * KBLK
            vals = [colbuf[q, base + j] for j in range(KBLK)]
            s = jnp.concatenate(
                [soa_ref[v & blkmask] for v in vals], axis=1)  # [8, K*CB]
            m = jnp.concatenate(
                [mtab_ref[(v >> mask_shift) & ((1 << nsub) - 1)]
                 for v in vals], axis=1)                       # [1, K*CB]
            dist2 = jnp.full((Cs, s.shape[1]), eps2, jnp.float32)
            ds = []
            for a in range(dim):
                da = tcols[a] - s[a:a + 1, :]          # (Cs, K*CB)
                ds.append(da)
                dist2 = dist2 + da * da
            r = jax.lax.rsqrt(dist2)
            w = r * r * r if dim == 3 else r * r
            w = w * m
            return tuple(c + jnp.sum(ds[a] * w, axis=1, keepdims=True)
                         for a, c in enumerate(carry))

        init = tuple(jnp.zeros((Cs, 1), jnp.float32) for _ in range(dim))
        nk = (deg + KBLK - 1) // KBLK
        acc = jax.lax.fori_loop(0, nk, body, init)
        cols = list(acc) + [jnp.zeros((Cs, 8 - dim), jnp.float32)]
        outs.append(jnp.concatenate(cols, axis=1))     # [Cs, 8]
    out_ref[0] = jnp.concatenate(outs, axis=0).reshape(-1)   # [CB*8]


def _p2p_stream_kernel(tgt_ref, col_hbm, degs_hbm, soa_hbm, mtab_ref,
                       out_ref, colbuf, degbuf, pbuf, colsem, degsem, psem,
                       *, dim: int, eps2: float, nsub: int, mask_shift: int):
    """HBM-streaming variant: the source SoA stays in HBM; each fori_loop
    step double-buffers its KBLK partner blocks into VMEM scratch while the
    previous tile computes.  Used when the whole SoA would blow the VMEM
    budget (N >~ 2.5M at 128-lane blocks) — the TPU analogue of the
    reference's L2/shared-mem streaming tiles (fmm_cart3_kdtree.cuh:797-870).
    """
    g = pl.program_id(0)
    blkmask = (1 << mask_shift) - 1

    cp = pltpu.make_async_copy(col_hbm.at[g], colbuf, colsem)
    cp.start()
    dp = pltpu.make_async_copy(degs_hbm.at[g], degbuf, degsem)
    dp.start()
    cp.wait()
    dp.wait()

    # flattened target block (see _p2p_kernel: avoids 16x lane padding)
    tgt = tgt_ref[0].reshape(-1, 8)                    # [CB, 8]
    CB = tgt.shape[0]
    Cs = CB // nsub
    outs = []
    for q in range(nsub):
        trows = tgt[q * Cs:(q + 1) * Cs]               # [Cs, 8]
        tcols = [trows[:, a:a + 1] for a in range(dim)]
        deg = degbuf[0, q]
        nk = (deg + KBLK - 1) // KBLK

        def fetch(slot, k, q=q):
            # KBLK scattered partner-block DMAs; padding entries point at
            # the FAR sentinel block, a valid soa row
            for j in range(KBLK):
                v = colbuf[q, k * KBLK + j]
                yield pltpu.make_async_copy(
                    soa_hbm.at[v & blkmask], pbuf.at[slot, j],
                    psem.at[slot, j])

        def start_fetch(slot, k, q=q):
            for c in fetch(slot, k, q):
                c.start()

        def wait_fetch(slot, k, q=q):
            for c in fetch(slot, k, q):
                c.wait()

        @pl.when(nk > 0)
        def _(q=q):
            start_fetch(0, 0, q)

        def body(k, carry, q=q, tcols=tcols, nk=nk):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nk)
            def _():
                start_fetch(jax.lax.rem(k + 1, 2), k + 1, q)

            wait_fetch(slot, k, q)
            base = k * KBLK
            vals = [colbuf[q, base + j] for j in range(KBLK)]
            s = jnp.concatenate(
                [pbuf[slot, j] for j in range(KBLK)], axis=1)  # [8, K*CB]
            m = jnp.concatenate(
                [mtab_ref[(v >> mask_shift) & ((1 << nsub) - 1)]
                 for v in vals], axis=1)                       # [1, K*CB]
            dist2 = jnp.full((Cs, s.shape[1]), eps2, jnp.float32)
            ds = []
            for a in range(dim):
                da = tcols[a] - s[a:a + 1, :]
                ds.append(da)
                dist2 = dist2 + da * da
            r = jax.lax.rsqrt(dist2)
            w = r * r * r if dim == 3 else r * r
            w = w * m
            return tuple(c + jnp.sum(ds[a] * w, axis=1, keepdims=True)
                         for a, c in enumerate(carry))

        init = tuple(jnp.zeros((Cs, 1), jnp.float32) for _ in range(dim))
        acc = jax.lax.fori_loop(0, nk, body, init)
        cols = list(acc) + [jnp.zeros((Cs, 8 - dim), jnp.float32)]
        outs.append(jnp.concatenate(cols, axis=1))     # [Cs, 8]
    out_ref[0] = jnp.concatenate(outs, axis=0).reshape(-1)   # [CB*8]


@functools.partial(jax.jit,
                   static_argnames=("dim", "eps2", "nsub", "mask_shift"))
def p2p_leaf_pairs_streaming(pos_rows: jax.Array, pos_soa: jax.Array,
                             row_ptr: jax.Array, col2d: jax.Array,
                             dim: int, eps2: float, nsub: int = 1,
                             mask_shift: int = 31) -> jax.Array:
    """Same contract as :func:`p2p_leaf_pairs`, but the SoA stays in HBM
    and partner blocks stream through a double-buffered VMEM scratch."""
    Gb, CB8 = pos_rows.shape
    CB = CB8 // 8
    assert pos_soa.shape[0] == Gb + 1 and pos_soa.shape[2] == CB
    assert CB % 128 == 0, "source block lane width must be 128-aligned"
    assert col2d.shape[0] == Gb * nsub
    Dmax = col2d.shape[1]
    assert Dmax % KBLK == 0
    col3d = col2d.reshape(Gb, nsub, Dmax)
    degs = row_ptr[1:] - row_ptr[:-1]
    degs2d = jnp.zeros((Gb, 1, 128), jnp.int32).at[:, 0, :nsub].set(
        degs.reshape(Gb, nsub))
    lane_group = np.arange(CB) // (CB // nsub)
    mtab = (((np.arange(1 << nsub)[:, None] >> lane_group[None, :]) & 1)
            .astype(np.float32)).reshape(1 << nsub, 1, CB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Gb,),
        in_specs=[
            pl.BlockSpec((1, CB * 8), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # col2d
            pl.BlockSpec(memory_space=pltpu.HBM),  # degs2d
            pl.BlockSpec(memory_space=pltpu.HBM),  # SoA stays in HBM
            pl.BlockSpec(((1 << nsub), 1, CB), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB * 8), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((nsub, Dmax), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.VMEM((2, KBLK, 8, CB), jnp.float32),   # partner stream
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, KBLK)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p2p_stream_kernel, dim=dim, eps2=float(eps2),
                          nsub=nsub, mask_shift=mask_shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gb, CB * 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(pos_rows, col3d, degs2d, pos_soa, jnp.asarray(mtab))


@functools.partial(jax.jit,
                   static_argnames=("dim", "eps2", "nsub", "mask_shift"))
def p2p_leaf_pairs(pos_rows: jax.Array, pos_soa: jax.Array,
                   row_ptr: jax.Array, col2d: jax.Array,
                   dim: int, eps2: float, nsub: int = 1,
                   mask_shift: int = 31) -> jax.Array:
    """Near-field accelerations on padded target blocks.

    pos_rows: [Gb, CB*8] targets, each block a row-major flattened
    [CB, 8] tile (CB = nsub sub-leaves of Csub rows) — flattened so the
    8-wide axis never sits on the 128-lane minor dim, where XLA tile
    padding would expand it 16x in HBM (8 GB of padding at N=10M);
    pos_soa: [Gb+1, 8, CB] source blocks (last block = FAR sentinel; held
    fully VMEM-resident); row_ptr: [Gb*nsub + 1] int32 per-SUB-LEAF degree
    CSR; col2d: [Gb*nsub, Dmax] int32 packed partner entries
    (blk | mask << mask_shift, padding entries mask 0), Dmax a multiple of
    KBLK.  Returns [Gb, CB*8].
    """
    Gb, CB8 = pos_rows.shape
    CB = CB8 // 8
    assert pos_soa.shape[0] == Gb + 1 and pos_soa.shape[2] == CB
    assert CB % 128 == 0, "source block lane width must be 128-aligned"
    assert col2d.shape[0] == Gb * nsub
    Dmax = col2d.shape[1]
    assert Dmax % KBLK == 0
    col3d = col2d.reshape(Gb, nsub, Dmax)
    degs = row_ptr[1:] - row_ptr[:-1]
    degs2d = jnp.zeros((Gb, 1, 128), jnp.int32).at[:, 0, :nsub].set(
        degs.reshape(Gb, nsub))
    # mask table: row b = per-lane group membership of bit pattern b
    # (shaped [2^nsub, 1, CB] so indexed rows are 2-D — Mosaic cannot
    # concatenate 1-D vectors past one 128-lane tile)
    lane_group = np.arange(CB) // (CB // nsub)
    mtab = (((np.arange(1 << nsub)[:, None] >> lane_group[None, :]) & 1)
            .astype(np.float32)).reshape(1 << nsub, 1, CB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Gb,),
        in_specs=[
            pl.BlockSpec((1, CB * 8), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # col2d: DMA rows to SMEM
            pl.BlockSpec(memory_space=pltpu.HBM),  # degs2d
            # whole SoA resident in VMEM across the grid (constant index)
            pl.BlockSpec((Gb + 1, 8, CB), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((1 << nsub), 1, CB), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB * 8), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((nsub, Dmax), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p2p_kernel, dim=dim, eps2=float(eps2),
                          nsub=nsub, mask_shift=mask_shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Gb, CB * 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(pos_rows, col3d, degs2d, pos_soa, jnp.asarray(mtab))
