"""Diagnose the FMM force-error floor at N=1M.

Round-2 observation: mean rel. error saturates ~2e-3 as (p, r) rise — not
MAC truncation behavior.  This script separates:
  * metric tail: error percentiles + error restricted to large-|a| targets
    (mean-relative error amplifies particles with near-zero net force);
  * near-field f32 cancellation: the P2P scan accumulator vs a Kahan-
    compensated twin on the same pair list (beam-core particles sum large
    cancelling neighbor forces, so plain f32 accumulation noise is
    amplified by summand/net ratio).

Usage: python scripts/err_diag.py [n] [p] [r]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5

    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
    from coulomb_oscillators_tpu.ops.reductions import rel_diff1

    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg.omega0, x))
    pos_h, _ = ID.init_gaussian(n, x, u, dtype=np.float32)
    pos = jnp.asarray(pos_h)

    eng = KdFmmEngine(cfg, n)
    fs = eng.build(pos)
    acc = eng.force(pos, fs)
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 8192, replace=False))
    ref = D.direct_kahan_targets(pos[sub], pos, cfg.eps2, cfg.kappa(n))
    # quantify the PLAIN f32 direct kernel's own noise vs the Kahan oracle
    ref_plain = D.direct(pos, cfg.eps2, cfg.kappa(n))
    e_oracle = np.asarray(rel_diff1(ref_plain[sub], ref))
    print(f"plain-direct oracle noise: mean={e_oracle.mean():.3e} "
          f"p99={np.percentile(e_oracle, 99):.3e}")
    e = np.asarray(rel_diff1(acc[sub], ref))
    amag = np.asarray(jnp.linalg.norm(ref, axis=1))
    order = np.argsort(amag)
    qs = [50, 90, 99, 99.9]
    print(f"p={p} r={r} n={n}: mean={e.mean():.3e} "
          + " ".join(f"p{q}={np.percentile(e, q):.3e}" for q in qs)
          + f" max={e.max():.3e}")
    half = order[len(order) // 2:]
    lo = order[: len(order) // 2]
    print(f"  mean err | top-half |a|: {e[half].mean():.3e}   "
          f"bottom-half |a|: {e[lo].mean():.3e}")
    l2 = float(jnp.linalg.norm(acc[sub] - ref)
               / jnp.linalg.norm(ref))
    print(f"  L2-norm-ratio err: {l2:.3e}")

    # ---- P2P accumulation noise: plain scan vs Kahan-compensated scan ----
    st = eng.st
    G, C, dim = 1 << eng.L, st.C, eng.dim
    ppad = eng.pad_array(pos, fs, fill=1e18)

    near_plain = jax.jit(eng._stage_p2p)(ppad, fs)

    def p2p_kahan(ppad, fs):
        dtype = ppad.dtype
        eps2 = dtype.type(cfg.eps2)
        tgt = jnp.minimum(fs.p2p_tgt, G - 1)
        pchunk = min(eng.p2p_chunk, tgt.shape[0])
        Q = tgt.shape[0]
        qpad = -(-Q // pchunk) * pchunk
        tgt_c = jnp.pad(tgt, (0, qpad - Q),
                        constant_values=G).reshape(-1, pchunk)
        src_c = jnp.pad(fs.p2p_src, (0, qpad - Q)).reshape(-1, pchunk)
        val_c = jnp.pad(fs.p2p_valid, (0, qpad - Q)).reshape(-1, pchunk)

        def body(carry, args):
            acc, comp = carry
            ti, si, vv = args
            P_t = jnp.take(ppad, jnp.minimum(ti, G - 1), axis=0)
            P_s = jnp.take(ppad, si, axis=0)
            dist2 = eps2
            ds = []
            for a in range(dim):
                da = P_t[:, :, None, a] - P_s[:, None, :, a]
                ds.append(da)
                dist2 = dist2 + da * da
            rr = jax.lax.rsqrt(dist2)
            w = (rr * rr * rr if dim == 3 else rr * rr) * vv[:, None, None]
            f = jnp.stack([jnp.sum(ds[a] * w, axis=2) for a in range(dim)],
                          axis=-1)
            contrib = jax.ops.segment_sum(f, ti, num_segments=G + 1,
                                          indices_are_sorted=True)
            y = contrib - comp
            t = acc + y
            comp = (t - acc) - y
            return (t, comp), None

        z = jnp.zeros((G + 1, C, dim), dtype)
        (acc, _), _ = jax.lax.scan(body, (z, z), (tgt_c, src_c, val_c))
        return acc[:G]

    near_kahan = jax.jit(p2p_kahan)(ppad, fs)
    dpad = np.asarray(jnp.linalg.norm(near_plain - near_kahan, axis=-1))
    npad = np.asarray(jnp.linalg.norm(near_kahan, axis=-1))
    mask = np.asarray(eng.mask3)
    reln = dpad[mask] / np.maximum(npad[mask], 1e-30)
    print(f"  P2P plain-vs-Kahan: mean={reln.mean():.3e} "
          f"p99={np.percentile(reln, 99):.3e} max={reln.max():.3e}")


if __name__ == "__main__":
    main()
