"""M2L stage microbenchmark: where do the ~64 ms/call go at the tuned
config (N=1M, p=6, r=1.67), and does a grouped dense-reduce beat the
per-entry segment_sum?

Variants timed (all scans over the same padded entry cap):
  full      : the production _stage_m2l (gather + sparse FMAs + segment_sum)
  gather    : multipole row gather only (+ trivial reduce)
  compute   : gather + sparse FMAs, NO scatter (sum-reduce instead)
  segsum    : gather + trivial per-entry value + segment_sum (no FMAs)
  grouped<g>: entries pre-padded per target to multiples of g ->
              within-group dense reshape-sum, then a g-times-smaller
              segment_sum (prototype of the restructured stage)

Run on the chip: python scripts/m2l_micro.py [N] [p] [r]
"""

import functools
import sys

sys.path.insert(0, ".")
import os
os.environ.setdefault("CO_M2L_FLY", "0")  # probes the stored-fold path


from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu import SimConfig
from coulomb_oscillators_tpu.models import init_dist as ID
from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
from coulomb_oscillators_tpu.ops.fmm.kdtree import _heap_off, _pick_chunk
from coulomb_oscillators_tpu.ops.multipole import operators as mop
from coulomb_oscillators_tpu.utils.timing import test_time_chained


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.67

    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)
    pos = jnp.asarray(pos_h)

    eng = KdFmmEngine(cfg, n)
    fs = eng.build(pos)
    t = eng.tables
    L = eng.L
    Mheap = _heap_off(L + 1)
    K = fs.m2l_tgt.shape[0]
    chunk = _pick_chunk(K, eng.m2l_chunk)
    print(f"n={n} p={p} r={r} K(cap)={K} count={eng.last_counts['m2l']} "
          f"chunk={chunk} S_M={t.S_M} S_H={t.S_H} S_Lt={t.S_Lt}", flush=True)

    ppad = eng._pad_jit(pos, fs)
    mask3 = eng.mask3
    mp_j = jax.jit(lambda pp, m3, s: eng._stage_multipoles(pp, m3, s))
    mh = jax.block_until_ready(mp_j(ppad, mask3, fs))

    def chain(fn):
        def wrapped(h):
            out = fn(h)
            return h + jnp.mean(out) * 1e-30
        return wrapped

    # ---- full production stage ----
    full_j = jax.jit(lambda h, s: eng._stage_m2l(h, s))
    tt = test_time_chained(chain(lambda h: full_j(h, fs)), mh, min_loop=2.0)
    print(f"full     : {tt * 1e3:8.2f} ms", flush=True)

    nch = K // chunk
    bc = fs.m2l_src.reshape(nch, chunk)
    vc = fs.m2l_valid.reshape(nch, chunk)
    tac = jnp.minimum(fs.m2l_tgt + (~fs.m2l_valid) * Mheap,
                      Mheap).reshape(nch, chunk)
    h2c = fs.m2l_h2.reshape(nch, chunk, -1)
    wc = fs.m2l_w.reshape(nch, chunk)
    lgc = fs.m2l_logc.reshape(nch, chunk)

    # big streams as ARGUMENTS, not captured constants (a baked ~660 MB
    # literal wedges the remote-compile endpoint; see profile_force.py)
    # ---- gather only ----
    @jax.jit
    def gather_impl(h, bc):
        def body(acc, args):
            bi, = args
            MbX = jnp.take(h, bi, axis=0)
            return acc + jnp.sum(MbX, axis=0), None
        acc, _ = jax.lax.scan(body, jnp.zeros((t.S_M,), h.dtype), (bc,))
        return acc
    tt = test_time_chained(chain(lambda h: gather_impl(h, bc)), mh,
                           min_loop=2.0)
    print(f"gather   : {tt * 1e3:8.2f} ms", flush=True)

    # ---- gather with padded row layouts: is the 53-f32 (212 B) row the
    # issue-rate problem?  TPU vregs are (8, 128); a row that is a whole
    # number of 128-lane vectors may let XLA's gather run at stream rates
    # instead of ~21M rows/s ----
    for pad_w in (64, 128):
        hp = jnp.zeros((Mheap, pad_w), mh.dtype)

        @jax.jit
        def gather_pad(h, bc, hp=hp, pad_w=pad_w):
            hw = jax.lax.dynamic_update_slice(hp, h, (0, 0))
            hw = jax.lax.optimization_barrier(hw)   # keep the pad material
            def body(acc, args):
                bi, = args
                MbX = jnp.take(hw, bi, axis=0)
                return acc + jnp.sum(MbX[:, :t.S_M], axis=0), None
            acc, _ = jax.lax.scan(body, jnp.zeros((t.S_M,), h.dtype), (bc,))
            return acc
        tt = test_time_chained(chain(lambda h: gather_pad(h, bc)), mh,
                               min_loop=2.0)
        print(f"gather{pad_w:<3d}: {tt * 1e3:8.2f} ms", flush=True)

    # ---- gather with SORTED indices (what a source-major layout buys) ----
    bc_sorted = jnp.sort(bc, axis=1)

    tt = test_time_chained(chain(lambda h: gather_impl(h, bc_sorted)), mh,
                           min_loop=2.0)
    print(f"gathersrt: {tt * 1e3:8.2f} ms", flush=True)

    # ---- gather + FMAs, no scatter ----
    @jax.jit
    def compute_impl(h, bc, vc, h2c, wc, lgc):
        def body(acc, args):
            bi, vv, H2, w, logc = args
            MbX = jnp.take(h, bi, axis=0)
            La = mop.m2l_sparse_pre(t, MbX, H2, w, logc)
            return acc + jnp.sum(La * vv[:, None], axis=0), None
        acc, _ = jax.lax.scan(body, jnp.zeros((t.S_Lt,), h.dtype),
                              (bc, vc, h2c, wc, lgc))
        return acc
    tt = test_time_chained(
        chain(lambda h: compute_impl(h, bc, vc, h2c, wc, lgc)), mh,
        min_loop=2.0)
    print(f"compute  : {tt * 1e3:8.2f} ms", flush=True)

    # ---- gather + trivial value + segment_sum (no FMAs) ----
    @jax.jit
    def segsum_impl(h, bc, vc, tac, h2c, wc):
        def body(acc, args):
            bi, vv, ta, H2, w = args
            MbX = jnp.take(h, bi, axis=0)
            La = MbX[:, :t.S_Lt] * w[:, None] + H2[:, :t.S_Lt]
            La = La * vv[:, None]
            part = jax.ops.segment_sum(La, ta, num_segments=Mheap + 1,
                                       indices_are_sorted=True)
            return acc + part, None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((Mheap + 1, t.S_Lt), h.dtype),
            (bc, vc, tac, h2c, wc))
        return acc[:Mheap]
    tt = test_time_chained(
        chain(lambda h: segsum_impl(h, bc, vc, tac, h2c, wc)), mh,
        min_loop=2.0)
    print(f"segsum   : {tt * 1e3:8.2f} ms", flush=True)

    # ---- grouped prototype ----
    tgt_h = np.asarray(fs.m2l_tgt)
    src_h = np.asarray(fs.m2l_src)
    val_h = np.asarray(fs.m2l_valid).astype(bool)
    h2_h = np.asarray(fs.m2l_h2)
    w_h = np.asarray(fs.m2l_w)
    tgt_v = tgt_h[val_h]
    src_v = src_h[val_h]
    idx_v = np.nonzero(val_h)[0]
    rp = np.searchsorted(tgt_v, np.arange(Mheap + 1)).astype(np.int64)
    deg = np.diff(rp)
    tgt_ids = np.nonzero(deg)[0]
    degs = deg[tgt_ids]

    for g in (8, 16, 32):
        pdeg = -(-degs // g) * g
        K2 = int(pdeg.sum())
        K2p = -(-K2 // chunk) * chunk
        # scatter original entries into padded per-target runs
        off = np.zeros(len(tgt_ids) + 1, np.int64)
        np.cumsum(pdeg, out=off[1:])
        starts = rp[tgt_ids]                       # valid-entry run starts
        shift = np.repeat(off[:-1] - starts, degs)
        posn = np.arange(len(tgt_v), dtype=np.int64) + shift
        src2 = np.zeros(K2p, src_h.dtype)
        val2 = np.zeros(K2p, bool)
        h22 = np.zeros((K2p, h2_h.shape[1]), h2_h.dtype)
        w2 = np.zeros(K2p, w_h.dtype)
        src2[posn] = src_v
        val2[posn] = True
        h22[posn] = h2_h[idx_v]
        w2[posn] = w_h[idx_v]
        gta = np.full(K2p // g, Mheap, np.int32)
        gta[: K2 // g] = np.repeat(tgt_ids, pdeg // g).astype(np.int32)
        nch2 = K2p // chunk
        bc2 = jnp.asarray(src2).reshape(nch2, chunk)
        vc2 = jnp.asarray(val2).reshape(nch2, chunk)
        h2c2 = jnp.asarray(h22).reshape(nch2, chunk, -1)
        wc2 = jnp.asarray(w2).reshape(nch2, chunk)
        lg2 = jnp.zeros((nch2, chunk), w_h.dtype)
        gtac = jnp.asarray(gta).reshape(nch2, chunk // g)
        waste = K2p / max(1, len(tgt_v))

        # big streams as ARGUMENTS, not captured constants (a baked ~1 GB
        # literal chokes the remote-compile endpoint; see profile_force.py)
        @functools.partial(jax.jit, static_argnames=("g",))
        def grouped_impl(h, bc2, vc2, h2c2, wc2, lg2, gtac, g):
            def body(acc, args):
                bi, vv, H2, w, logc, ta_g = args
                MbX = jnp.take(h, bi, axis=0)
                La = mop.m2l_sparse_pre(t, MbX, H2, w, logc)
                La = La * vv[:, None]
                La = La.reshape(-1, g, t.S_Lt).sum(axis=1)
                part = jax.ops.segment_sum(La, ta_g,
                                           num_segments=Mheap + 1,
                                           indices_are_sorted=True)
                return acc + part, None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((Mheap + 1, t.S_Lt), h.dtype),
                (bc2, vc2, h2c2, wc2, lg2, gtac))
            return acc[:Mheap]

        def grouped(h):
            return grouped_impl(h, bc2, vc2, h2c2, wc2, lg2, gtac, g=g)

        tt = test_time_chained(chain(grouped), mh, min_loop=2.0)
        print(f"grouped{g:<2d}: {tt * 1e3:8.2f} ms  "
              f"(K2={K2p}, pad-waste x{waste:.2f})", flush=True)

        # correctness vs production
        ref = full_j(mh, fs)
        got = grouped(mh)
        d = float(jnp.max(jnp.abs(ref - got))
                  / (jnp.max(jnp.abs(ref)) + 1e-30))
        print(f"           max rel dev vs full: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
