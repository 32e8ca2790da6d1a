"""Pallas TPU kernel for the FMM near-field (P2P) pass.

Replaces the reference's shared-memory/subwarp P2P kernels
(fmm_p2p3_kdtree*, fmm_cart3_kdtree.cuh:767-1132) with a TPU-native
formulation exploiting the one resource GPUs lack: VMEM large enough to
hold EVERY source position at once.  The whole SoA position array
([G+1, 8, C], ~34 MB at N=1M/C=128) is pinned in VMEM for the entire grid,
so each target leaf reads its partner blocks directly from VMEM — zero
per-pair DMAs.  Per grid step (one target leaf):

  * its row of the partner table arrives via one SMEM DMA,
  * the target block [C, 8] streams in as a normal pipelined block,
  * a fori_loop over ceil(degree/K) steps gathers K partner blocks from the
    resident SoA and evaluates the softened kernel on one [C, K*C] tile —
    the K-wide tile amortizes loop/slice bookkeeping and keeps the VPU
    pipeline full (the round-1 kernel ran one [C, C] tile per step and was
    overhead-bound at ~20 G lane-int/s),
  * the output block is written exactly once (no atomics — the TPU answer
    to the reference's myAtomicAdd scatter).

Padded slots sit at FAR so their weights underflow to exactly zero; padded
partner-table entries point at an all-FAR sentinel block (index G).  The
self-pair diagonal contributes d * w(eps) = 0 like the reference's
self-interaction.  C must be a multiple of 128 (lane dim).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# partner blocks evaluated per loop step; env-overridable for tile-size
# experiments (scripts/p2p_bench.py)
KBLK = int(os.environ.get("CO_P2P_KBLK", "8"))


def _p2p_kernel(row_ptr, tgt_ref, col_hbm, soa_ref, out_ref,
                colbuf, colsem, *, dim: int, eps2: float):
    g = pl.program_id(0)
    deg = row_ptr[g + 1] - row_ptr[g]

    cp = pltpu.make_async_copy(col_hbm.at[g], colbuf, colsem)
    cp.start()
    cp.wait()
    # colbuf is [1, Dmax] in SMEM (rows padded with the sentinel block id)

    tgt = tgt_ref[0]                                   # [C, 8]
    C = tgt.shape[0]
    tcols = [tgt[:, a:a + 1] for a in range(dim)]      # (C, 1) each

    def body(k, carry):
        base = k * KBLK
        s = jnp.concatenate(
            [soa_ref[colbuf[0, base + j]] for j in range(KBLK)],
            axis=1)                                    # [8, KBLK*C]
        dist2 = jnp.full((C, KBLK * C), eps2, jnp.float32)
        ds = []
        for a in range(dim):
            da = tcols[a] - s[a:a + 1, :]              # (C, KBLK*C)
            ds.append(da)
            dist2 = dist2 + da * da
        r = jax.lax.rsqrt(dist2)
        w = r * r * r if dim == 3 else r * r
        return tuple(c + jnp.sum(ds[a] * w, axis=1, keepdims=True)
                     for a, c in enumerate(carry))

    init = tuple(jnp.zeros((C, 1), jnp.float32) for _ in range(dim))
    nk = (deg + KBLK - 1) // KBLK
    acc = jax.lax.fori_loop(0, nk, body, init)
    cols = list(acc) + [jnp.zeros((C, 8 - dim), jnp.float32)]
    out_ref[0] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("dim", "eps2"))
def p2p_leaf_pairs(pos_rows: jax.Array, pos_soa: jax.Array,
                   row_ptr: jax.Array, col2d: jax.Array,
                   dim: int, eps2: float) -> jax.Array:
    """Near-field accelerations on padded leaf blocks.

    pos_rows: [G, C, 8] targets; pos_soa: [G+1, 8, C] sources (last block =
    FAR sentinel; held fully VMEM-resident); row_ptr: [G+1] int32 degree
    CSR; col2d: [G, Dmax] int32 partner ids with padding entries = G (the
    sentinel), Dmax a multiple of KBLK.  Returns [G, C, 8].
    """
    G, C, _ = pos_rows.shape
    assert pos_soa.shape[0] == G + 1
    Dmax = col2d.shape[1]
    assert Dmax % KBLK == 0
    col3d = col2d.reshape(G, 1, Dmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C, 8), lambda g, rp: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # col2d: DMA rows to SMEM
            # whole SoA resident in VMEM across the grid (constant index)
            pl.BlockSpec((G + 1, 8, C), lambda g, rp: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, 8), lambda g, rp: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, Dmax), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_p2p_kernel, dim=dim, eps2=float(eps2)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, C, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(row_ptr, pos_rows, col3d, pos_soa)
