"""Total-energy diagnostic for drift measurements.

The reference has no explicit energy routine (its oracle is force accuracy);
the rebuild's north-star metric is relative energy drift over 10k steps
(BASELINE.md), so we provide the conserved Hamiltonian of the model:

    H = 1/2 sum_i |v_i|^2  +  1/2 sum_i omega0^2 (.) x_i^2  +  U_coulomb

with the softened pair potential matching the force law
(direct.cuh:23-35 integrated):

    3D: U = kappa/2 * sum_{i != j} 1 / sqrt(r_ij^2 + eps2)
    2D: U = -kappa/4 * sum_{i != j} log(r_ij^2 + eps2)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def total_energy_f64(pos, vel, eps2: float, kappa: float, omega0_sq,
                     chunk: int = 4096) -> float:
    """Hamiltonian in float64 on host (numpy, BLAS-chunked pairwise sum).

    The north-star drift bound (<=1e-6 @10k steps, BASELINE.md) is below
    float32 resolution (~6e-8 * sqrt/log of the term count), so the
    *measurement* itself must be f64: a drift certified with an f32
    accumulator would be indistinguishable from accumulator noise.  This is
    a diagnostic (every ~1000 steps), not a hot path — host f64 via the
    d^2 = |a|^2+|b|^2-2ab BLAS identity is plenty (~2 s at N=30001).
    """
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    n, dim = pos.shape
    ke = 0.5 * float(np.sum(vel * vel))
    trap = 0.5 * float(np.sum(pos * pos * np.asarray(omega0_sq, np.float64)))
    sq = np.sum(pos * pos, axis=1)
    pot = 0.0
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        rows = pos[i0:i1]
        d2 = sq[i0:i1, None] + sq[None, :] - 2.0 * (rows @ pos.T)
        np.maximum(d2, 0.0, out=d2)
        d2 += eps2
        if dim == 3:
            phi = 1.0 / np.sqrt(d2)
        else:
            phi = -0.5 * np.log(d2)
        phi[np.arange(i1 - i0), np.arange(i0, i1)] = 0.0   # self terms
        pot += float(phi.sum())
    return ke + trap + 0.5 * kappa * pot


@functools.partial(jax.jit, static_argnames=("src_chunk",))
def potential_rows_kahan(pos: jax.Array, eps2: float,
                         src_chunk: int = 512) -> jax.Array:
    """Per-particle softened pair-potential row sums, Kahan-compensated.

    phi_i = sum_{j != i} phi(|r_ij|), accumulated over source chunks with a
    compensation term (like direct_kahan / direct3, direct.cuh:192-245) so
    each row is accurate to O(eps_f32) regardless of N.  Self pairs are
    excluded *inside* the kernel: phi(0) = 1/eps ~ 1e9 would obliterate an
    f32 row sum (~1e2) if subtracted after the fact.

    Device-side replacement for a host f64 pairwise sum (which takes minutes
    at N=30001 on one CPU core); the [n] rows are summed in f64 on host by
    total_energy_kahan, giving ~1e-10 relative accuracy on the total.
    """
    n, dim = pos.shape
    npad = -(-n // src_chunk) * src_chunk
    src = jnp.pad(pos, ((0, npad - n), (0, 0)))
    valid = (jnp.arange(npad) < n).astype(pos.dtype)
    src_chunks = src.reshape(npad // src_chunk, src_chunk, dim)
    mask_chunks = valid.reshape(npad // src_chunk, src_chunk)
    gidx = jnp.arange(npad).reshape(npad // src_chunk, src_chunk)
    rows = jnp.arange(n)

    def body(carry, xs):
        acc, comp = carry
        s, m, gi = xs
        d = pos[:, None, :] - s[None, :, :]                 # [N, C, D]
        dist2 = jnp.sum(d * d, axis=-1) + eps2
        if dim == 3:
            phi = jax.lax.rsqrt(dist2)
        else:
            phi = -0.5 * jnp.log(dist2)
        notself = (rows[:, None] != gi[None, :]).astype(pos.dtype)
        contrib = jnp.sum(phi * (m[None, :] * notself), axis=1)
        y = contrib - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    init = (jnp.zeros((n,), pos.dtype), jnp.zeros((n,), pos.dtype))
    (rows_sum, _), _ = jax.lax.scan(body, init,
                                    (src_chunks, mask_chunks, gidx))
    return rows_sum


def total_energy_kahan(pos, vel, eps2: float, kappa: float,
                       omega0_sq) -> float:
    """Hamiltonian: device Kahan pair rows + host f64 reduction.

    Accurate to ~1e-10 relative — sufficient to certify the <=1e-6 drift
    north star — at device speed (ms, vs minutes for the host-f64 pairwise
    sum at N=30001)."""
    rows = np.asarray(potential_rows_kahan(jnp.asarray(pos), eps2),
                      np.float64)
    pos_h = np.asarray(pos, np.float64)
    vel_h = np.asarray(vel, np.float64)
    ke = 0.5 * float(np.sum(vel_h * vel_h))
    trap = 0.5 * float(np.sum(pos_h * pos_h
                              * np.asarray(omega0_sq, np.float64)))
    return ke + trap + 0.5 * kappa * float(rows.sum())


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def coulomb_potential(pos: jax.Array, eps2: float, kappa: float,
                      row_chunk: int = 512) -> jax.Array:
    """Softened pairwise potential energy (i != j pairs, counted once)."""
    n, dim = pos.shape
    npad = -(-n // row_chunk) * row_chunk
    padded = jnp.pad(pos, ((0, npad - n), (0, 0)))
    idx = jnp.arange(npad).reshape(npad // row_chunk, row_chunk)
    chunks = padded.reshape(npad // row_chunk, row_chunk, dim)

    def chunk_pot(args):
        rows, rid = args
        d = rows[:, None, :] - pos[None, :, :]
        dist2 = jnp.sum(d * d, axis=-1) + eps2
        # mask: self pairs and padded target rows
        valid = (rid[:, None] != jnp.arange(n)[None, :]) & (rid[:, None] < n)
        if dim == 3:
            phi = jax.lax.rsqrt(dist2)
        else:
            phi = -0.5 * jnp.log(dist2)
        return jnp.sum(jnp.where(valid, phi, 0.0).astype(jnp.float32))

    pots = jax.lax.map(chunk_pot, (chunks, idx))
    return 0.5 * kappa * jnp.sum(pots)


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def total_energy(pos: jax.Array, vel: jax.Array, eps2: float, kappa: float,
                 omega0_sq, row_chunk: int = 512) -> jax.Array:
    """Conserved Hamiltonian (per unit mass). Computed in float32 accumulators."""
    ke = 0.5 * jnp.sum(jnp.square(vel).astype(jnp.float32))
    k = jnp.asarray(omega0_sq, dtype=jnp.float32)
    trap = 0.5 * jnp.sum(jnp.square(pos).astype(jnp.float32) * k)
    pot = coulomb_potential(pos, eps2, kappa, row_chunk=row_chunk)
    return ke + trap + pot
