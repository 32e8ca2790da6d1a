"""Direct O(N^2) softened-Coulomb force.

The pairwise force law matches the reference (Simulation/direct.cuh:23-35):
for displacement d = p_i - p_j and dist2 = |d|^2 + eps2,

    2D:  a_i += d / dist2            (log potential)
    3D:  a_i += d / dist2^(3/2)      (1/r potential)
    4D:  a_i += d / dist2^2          (1/r^2 potential; jnp paths only —
                                      direct.cuh:32-35)

and the result is scaled by kappa = xi/N (param[0], direct.cuh:59-61).
The j == i self term contributes exactly 0 (d = 0), as in the reference.

Three implementations:

  * :func:`direct` — Pallas TPU kernel, tiled over (target, source) blocks
    with VMEM-resident accumulation.  The fast path (replaces the CUDA
    shared-memory tile kernel direct.cuh:51-138 with an idiomatic TPU grid).
  * :func:`direct_jnp` — chunked jnp broadcast; runs anywhere (the analogue
    of direct2, direct.cuh:140-190).
  * :func:`direct_kahan` — Kahan-compensated accuracy oracle, the analogue
    of ``direct3`` (direct.cuh:192-245); used as the test/auto-tune
    reference engine.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_weight(dist2: jax.Array, dim: int) -> jax.Array:
    """w(d) such that the force contribution is d * w (direct.cuh:23-35):
    2D 1/dist2, 3D dist2^(-3/2), 4D 1/dist2^2 (the reference's 4D force
    profile, direct.cuh:32-35)."""
    inv = 1.0 / dist2
    if dim == 2:
        return inv
    if dim == 3:
        return inv * jax.lax.rsqrt(dist2)
    if dim == 4:
        return inv * inv
    raise ValueError(f"unsupported dim {dim}")


# --------------------------------------------------------------------------- #
# jnp reference paths
# --------------------------------------------------------------------------- #


def _acc_rows(pos_rows: jax.Array, pos_all: jax.Array, eps2, dim: int) -> jax.Array:
    """Accelerations on a chunk of target rows against all sources."""
    d = pos_rows[:, None, :] - pos_all[None, :, :]          # [R, N, D]
    dist2 = jnp.sum(d * d, axis=-1) + eps2                  # [R, N]
    w = _pair_weight(dist2, dim)
    return jnp.einsum("rn,rnd->rd", w, d)


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def direct_jnp(pos: jax.Array, eps2: float, kappa: float, row_chunk: int = 1024):
    """Chunked O(N^2) pairwise force; [N, D] -> [N, D].

    Rows are processed in chunks of `row_chunk` targets via lax.map to bound
    the [R, N] intermediate, mirroring the grid-stride structure of
    direct2 (direct.cuh:140-190) without materialising N^2 memory.
    """
    n, dim = pos.shape
    npad = -(-n // row_chunk) * row_chunk
    padded = jnp.pad(pos, ((0, npad - n), (0, 0)))
    chunks = padded.reshape(npad // row_chunk, row_chunk, dim)
    acc = jax.lax.map(lambda rows: _acc_rows(rows, pos, eps2, dim), chunks)
    return kappa * acc.reshape(npad, dim)[:n]


@functools.partial(jax.jit, static_argnames=("src_chunk",))
def direct_kahan_targets(targets: jax.Array, pos: jax.Array, eps2: float,
                         kappa: float, src_chunk: int = 2048):
    """Kahan-compensated forces of ALL `pos` sources on `targets` rows only.

    The subsampled oracle for large N: at N=1M the plain f32 direct kernel's
    own accumulation noise reaches ~1e-3 mean-relative for beam-core
    particles (large cancelling near-neighbor contributions), which
    saturates any error measurement made against it.  Self-pairs are
    excluded by distance identity (a target coincides with exactly one
    source, contributing d = 0).
    """
    nt, dim = targets.shape
    n = pos.shape[0]
    npad = -(-n // src_chunk) * src_chunk
    src = jnp.pad(pos, ((0, npad - n), (0, 0)))
    valid = (jnp.arange(npad) < n).astype(pos.dtype)
    src_chunks = src.reshape(npad // src_chunk, src_chunk, dim)
    mask_chunks = valid.reshape(npad // src_chunk, src_chunk)

    def body(carry, xs):
        acc, comp = carry
        s, m = xs
        d = targets[:, None, :] - s[None, :, :]
        dist2 = jnp.sum(d * d, axis=-1) + eps2
        w = _pair_weight(dist2, dim) * m[None, :]
        contrib = jnp.einsum("nc,ncd->nd", w, d)
        y = contrib - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    init = (jnp.zeros_like(targets), jnp.zeros_like(targets))
    (acc, _), _ = jax.lax.scan(body, init, (src_chunks, mask_chunks))
    return kappa * acc


@functools.partial(jax.jit, static_argnames=("src_chunk",))
def direct_kahan(pos: jax.Array, eps2: float, kappa: float, src_chunk: int = 512):
    """Kahan-compensated direct sum — the accuracy oracle.

    Mirrors ``direct3`` (direct.cuh:192-245): the per-target accumulation over
    source chunks carries a compensation term, so the summation error stays
    O(eps) independent of N even in float32.
    """
    n, dim = pos.shape
    npad = -(-n // src_chunk) * src_chunk
    src = jnp.pad(pos, ((0, npad - n), (0, 0)))
    # Padded (zero) sources must not contribute: mask them out.
    valid = (jnp.arange(npad) < n).astype(pos.dtype)
    src_chunks = src.reshape(npad // src_chunk, src_chunk, dim)
    mask_chunks = valid.reshape(npad // src_chunk, src_chunk)

    def body(carry, xs):
        acc, comp = carry
        s, m = xs
        d = pos[:, None, :] - s[None, :, :]                 # [N, C, D]
        dist2 = jnp.sum(d * d, axis=-1) + eps2
        w = _pair_weight(dist2, dim) * m[None, :]
        contrib = jnp.einsum("nc,ncd->nd", w, d)
        # Kahan update (direct.cuh:213-221)
        y = contrib - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    init = (jnp.zeros_like(pos), jnp.zeros_like(pos))
    (acc, _), _ = jax.lax.scan(body, init, (src_chunks, mask_chunks))
    return kappa * acc


# --------------------------------------------------------------------------- #
# Pallas TPU kernel
# --------------------------------------------------------------------------- #

# Coordinate rows in the padded SoA layout: row r of the [8, Npad] source
# array holds coordinate r (r < dim), zeros elsewhere.  8 rows keep the f32
# sublane tiling happy.
_COORD_ROWS = 8


def _direct_kernel(tgt_ref, src_ref, out_ref, *, dim: int, eps2: float):
    """One (target-tile i, source-tile j) step.

    tgt_ref: [TI, 8]   target coordinates (row-major points)
    src_ref: [8, TS]   source coordinates (SoA)
    out_ref: [TI, 8]   accumulated accelerations for target tile i
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    ti = tgt_ref.shape[0]
    ts = src_ref.shape[1]

    # Pairwise displacement per coordinate: [TI, TS]
    dx = tgt_ref[:, 0:1] - src_ref[0:1, :]
    dy = tgt_ref[:, 1:2] - src_ref[1:2, :]
    dist2 = dx * dx + dy * dy + eps2
    if dim == 3:
        dz = tgt_ref[:, 2:3] - src_ref[2:3, :]
        dist2 += dz * dz

    inv = 1.0 / dist2
    if dim == 3:
        w = inv * jax.lax.rsqrt(dist2)
    else:
        w = inv
    # row `dim` of the source SoA carries validity (1 real / 0 pad), so
    # padded columns contribute exactly zero in every dim
    w = w * src_ref[dim:dim + 1, :]

    ax = jnp.sum(dx * w, axis=1, keepdims=True)             # [TI, 1]
    ay = jnp.sum(dy * w, axis=1, keepdims=True)
    cols = [ax, ay]
    if dim == 3:
        cols.append(jnp.sum(dz * w, axis=1, keepdims=True))
    cols.append(jnp.zeros((ti, _COORD_ROWS - len(cols)), out_ref.dtype))
    out_ref[:, :] += jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("eps2", "kappa", "tile_i", "tile_j"))
def direct(
    pos: jax.Array,
    eps2: float,
    kappa: float,
    tile_i: int = 256,
    tile_j: int = 2048,
):
    """Pallas tiled direct force on TPU; [N, D] -> [N, D].

    Targets stream as [tile_i, 8] row blocks, sources as [8, tile_j] SoA
    blocks; the (i, j) grid accumulates into the target-tile output block
    (revisited across j), so arbitrary N pipelines through VMEM.  Padded
    slots sit at the softening-regularised origin and contribute a d=0 term
    exactly like the reference's self-interaction (zero).
    """
    n, dim = pos.shape
    if dim not in (2, 3):
        raise ValueError(f"unsupported dim {dim}")
    dtype = pos.dtype

    ni = -(-n // tile_i)
    nj = -(-n // tile_j)
    npad_i = ni * tile_i
    npad_j = nj * tile_j
    npad = max(npad_i, npad_j)

    # Padded targets [Npad_i, 8]; padded slots at origin.
    tgt = jnp.zeros((npad_i, _COORD_ROWS), dtype).at[:n, :dim].set(pos)
    # Padded sources [8, Npad_j] (SoA); row `dim` is the validity row the
    # kernel multiplies into the pair weight (exact zero for pad columns —
    # the 2D 1/r^2 weight does not underflow the way the 3D one does).
    src = jnp.zeros((_COORD_ROWS, npad_j), dtype).at[:dim, :n].set(pos.T)
    src = src.at[dim, :n].set(dtype.type(1))

    del npad

    out = pl.pallas_call(
        functools.partial(_direct_kernel, dim=dim, eps2=float(eps2)),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((tile_i, _COORD_ROWS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_COORD_ROWS, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, _COORD_ROWS), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad_i, _COORD_ROWS), dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(ni * tile_i) * int(nj * tile_j) * (12 if dim == 3 else 8),
            bytes_accessed=(npad_i * _COORD_ROWS + npad_j * _COORD_ROWS) * 4,
            transcendentals=int(ni * tile_i) * int(nj * tile_j),
        ),
    )(tgt, src)
    return kappa * out[:n, :dim]
