"""Micro-profile of the L2L+L2P stage sub-ops at N=1M shapes.

Usage: python scripts/l2p_micro.py [p]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu.ops.multipole import harmonics as hm
from coulomb_oscillators_tpu.ops.multipole import operators as mop
from coulomb_oscillators_tpu.ops.multipole.tables import build_tables
from coulomb_oscillators_tpu.utils.timing import test_time_chained


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t = build_tables(3, p)
    G, C = 8192, 128
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(G, C, 3)).astype(np.float32) * 0.3)
    Lt = jnp.asarray(rng.normal(size=(G, t.S_Lt)).astype(np.float32))
    lam = jnp.asarray(np.abs(rng.normal(size=(G,)).astype(np.float32)) + 0.5)
    print(f"p={p} S_Lt={t.S_Lt} S_Lf={t.S_Lf} PL={t.PL}")

    @jax.jit
    def mono(w):
        V = hm.eval_monomials(w.reshape(G * C, 3), t.PL, 3)
        return w + jnp.mean(V) * 1e-30
    print(f"monomials        : {test_time_chained(mono, w, min_loop=2.0)*1e3:8.2f} ms")

    Vc = jax.jit(lambda w: hm.eval_monomials(w.reshape(G * C, 3), t.PL, 3)
                 .reshape(G, C, -1))(w)
    D = jnp.asarray(t.l2p_D)

    @jax.jit
    def wein(Lt):
        Lf = mop.expand_L(t, Lt)
        W = jnp.einsum("akj,gj->gak", D, Lf, precision=mop.PREC)
        return Lt + jnp.mean(W) * 1e-30
    print(f"expand+W         : {test_time_chained(wein, Lt, min_loop=2.0)*1e3:8.2f} ms")

    Lf0 = jax.jit(lambda Lt: mop.expand_L(t, Lt))(Lt)
    W0 = jnp.einsum("akj,gj->gak", D, Lf0)

    @jax.jit
    def fein(V):
        F = -jnp.einsum("gck,gak->gca", V, W0, precision=mop.PREC)
        return V + jnp.mean(F) * 1e-30
    print(f"final einsum     : {test_time_chained(fein, Vc, min_loop=2.0)*1e3:8.2f} ms")

    @jax.jit
    def fmat(V):
        F = -jnp.matmul(V, jnp.swapaxes(W0, 1, 2), precision=mop.PREC)
        return V + jnp.mean(F) * 1e-30
    print(f"final batchmatmul: {test_time_chained(fmat, Vc, min_loop=2.0)*1e3:8.2f} ms")

    @jax.jit
    def full(w):
        F = mop.l2p_field_blocked(t, Lt, w, lam)
        return w + F * 1e-30
    print(f"l2p_field_blocked: {test_time_chained(full, w, min_loop=2.0)*1e3:8.2f} ms")

    # l2l_down equivalent: one l2l over [G] nodes (leaf level dominates)
    s = jnp.asarray(rng.normal(size=(G, 3)).astype(np.float32) * 0.1)
    rho = jnp.asarray(np.full(G, 0.7, np.float32))

    @jax.jit
    def l2l1(Lt):
        out = mop.l2l(t, Lt, s, rho)
        return Lt + out * 1e-30
    print(f"l2l (G nodes)    : {test_time_chained(l2l1, Lt, min_loop=2.0)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
