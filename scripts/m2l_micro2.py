"""Round-5 M2L gather candidates, measured in isolation on the chip.

Round-4 facts (scripts/m2l_micro.py + docs/ROOFLINE.md): the per-entry
multipole row gather is the M2L floor (~148 ms of the 200 ms grouped
stage at N=1M p=6); the rows are 53 f32 (212 B) and each source row is
re-gathered ~44x per eval.  Window analysis (scripts/m2l_window_stats.py):
only SOURCE-major ordering has bounded per-chunk source windows
(p99 = 205 rows at chunk 2048 vs ~50k target-major).

Variants:
  full      : production _stage_m2l (target-major grouped, round-4)
  winchunk  : source-major chunks, re-sorted by target WITHIN each chunk;
              multipole rows come from one contiguous dynamic_slice window
              per chunk + an in-window one-hot matmul on the MXU (no row
              gather anywhere); scatter = per-chunk sorted segment_sum
  winchunk_bf16 : same, one-hot matmul in DEFAULT precision (the one-hot
              side is exact in bf16; measures the 3-pass cost)
  srcbcast<g>: source-major, per-source runs padded to multiples of g;
              gather K/g rows + in-register broadcast (gather shrinks
              g-fold); FMAs; trivial reduce (NO scatter) — isolates the
              gather-side alternative

Run on the chip: python scripts/m2l_micro2.py [N] [p] [r] [chunk]
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
from coulomb_oscillators_tpu.ops.fmm.kdtree import _heap_off
from coulomb_oscillators_tpu.ops.multipole import operators as mop
from coulomb_oscillators_tpu.utils.timing import test_time_chained


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.43
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)
    pos = jnp.asarray(pos_h)

    eng = KdFmmEngine(cfg, n)
    fs = eng.build(pos)
    t = eng.tables
    Mheap = _heap_off(eng.L + 1)

    ppad = eng._pad_jit(pos, fs)
    mp_j = jax.jit(lambda pp, m3, s: eng._stage_multipoles(pp, m3, s))
    mh = jax.block_until_ready(mp_j(ppad, eng.mask3, fs))

    def chain(fn):
        def wrapped(h):
            out = fn(h)
            return h + jnp.mean(out) * 1e-30
        return wrapped

    full_j = jax.jit(lambda h, s: eng._stage_m2l(h, s))
    tt = test_time_chained(chain(lambda h: full_j(h, fs)), mh, min_loop=2.0)
    print(f"full       : {tt * 1e3:8.2f} ms", flush=True)
    ref = full_j(mh, fs)

    # ---- valid entries, source-major order ----
    val_h = np.asarray(fs.m2l_valid).astype(bool)
    tgt_v = np.asarray(fs.m2l_tgt)[val_h].astype(np.int64)
    src_v = np.asarray(fs.m2l_src)[val_h].astype(np.int64)
    h2_v = np.asarray(fs.m2l_h2)[val_h]
    w_v = np.asarray(fs.m2l_w)[val_h]
    K = len(src_v)
    order = np.lexsort((tgt_v, src_v))          # src major, tgt minor
    sv, tv, h2v, wv = (src_v[order], tgt_v[order], h2_v[order], w_v[order])

    # ---- winchunk layout ----
    Kp = -(-K // chunk) * chunk
    nch = Kp // chunk
    s2 = np.zeros(Kp, np.int64)
    t2 = np.full(Kp, Mheap, np.int64)           # pad -> dropped segment
    h22 = np.zeros((Kp, h2v.shape[1]), h2v.dtype)
    w2 = np.zeros(Kp, wv.dtype)
    s2[:K], t2[:K], h22[:K], w2[:K] = sv, tv, h2v, wv
    s2[K:] = s2[K - 1] if K else 0              # keep window tight
    slo = s2.reshape(nch, chunk).min(axis=1)
    win = int((s2.reshape(nch, chunk).max(axis=1) - slo + 1).max())
    Ws = -(-win // 128) * 128
    print(f"K={K} chunk={chunk} nch={nch} max-window={win} Ws={Ws}",
          flush=True)
    s_loc = (s2 - np.repeat(slo, chunk)).astype(np.int32)
    # within-chunk re-sort by target (scatter side wants sorted ids;
    # the window [slo, slo+Ws) is a per-chunk SET property - order-free)
    o2 = np.lexsort((s2, t2, np.repeat(np.arange(nch), chunk)))
    s_loc, t2, h22, w2 = s_loc[o2], t2[o2], h22[o2], w2[o2]

    sloj = jnp.asarray(slo.astype(np.int32))
    slocj = jnp.asarray(s_loc.reshape(nch, chunk))
    tj = jnp.asarray(np.minimum(t2, Mheap).astype(np.int32)
                     .reshape(nch, chunk))
    h2j = jnp.asarray(h22.reshape(nch, chunk, -1))
    wj = jnp.asarray(w2.reshape(nch, chunk))
    lgj = jnp.zeros((nch, chunk), w2.dtype)

    iota = jnp.arange(Ws, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("prec",))
    def winchunk_impl(h, sloj, slocj, tj, h2j, wj, lgj, prec):
        def body(acc, args):
            lo, sl, ta, H2, w, logc = args
            winrows = jax.lax.dynamic_slice(
                h, (lo, 0), (Ws, h.shape[1]))            # contiguous
            onehot = (sl[:, None] == iota[None, :]).astype(h.dtype)
            MbX = jnp.matmul(onehot, winrows, precision=prec)
            La = mop.m2l_sparse_pre(t, MbX, H2, w, logc)
            part = jax.ops.segment_sum(La, ta, num_segments=Mheap + 1,
                                       indices_are_sorted=True)
            return acc + part, None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((Mheap + 1, t.S_Lt), h.dtype),
            (sloj, slocj, tj, h2j, wj, lgj))
        return acc[:Mheap]

    hpad = jnp.concatenate([mh, jnp.zeros((Ws, t.S_M), mh.dtype)])

    for name, prec in (("winchunk   ", jax.lax.Precision.HIGHEST),
                       ("winchunk_bf", jax.lax.Precision.DEFAULT)):
        def run(h, prec=prec):
            return winchunk_impl(h, sloj, slocj, tj, h2j, wj, lgj, prec)
        tt = test_time_chained(chain(run), hpad, min_loop=2.0)
        got = run(hpad)
        d = float(jnp.max(jnp.abs(ref - got))
                  / (jnp.max(jnp.abs(ref)) + 1e-30))
        print(f"{name}: {tt * 1e3:8.2f} ms   max rel dev vs full: {d:.2e}",
              flush=True)

    # ---- srcbcast: per-source runs padded to g, gather K/g rows ----
    for g in (8, 16):
        uniq, start = np.unique(sv, return_index=True)
        deg = np.diff(np.append(start, K))
        pdeg = -(-deg // g) * g
        K2 = int(pdeg.sum())
        K2p = -(-K2 // chunk) * chunk
        off = np.zeros(len(uniq) + 1, np.int64)
        np.cumsum(pdeg, out=off[1:])
        posn = np.arange(K, dtype=np.int64) + np.repeat(off[:-1] - start, deg)
        rows = np.zeros(K2p // g, np.int32)
        rows[: K2 // g] = np.repeat(uniq, pdeg // g).astype(np.int32)
        h2b = np.zeros((K2p, h2v.shape[1]), h2v.dtype)
        wb = np.zeros(K2p, wv.dtype)
        vb = np.zeros(K2p, bool)
        h2b[posn] = h2v
        wb[posn] = wv
        vb[posn] = True
        nch2 = K2p // chunk
        rj = jnp.asarray(rows.reshape(nch2, chunk // g))
        h2bj = jnp.asarray(h2b.reshape(nch2, chunk, -1))
        wbj = jnp.asarray(wb.reshape(nch2, chunk))
        vbj = jnp.asarray(vb.reshape(nch2, chunk))
        lgbj = jnp.zeros((nch2, chunk), wv.dtype)

        @functools.partial(jax.jit, static_argnames=("g",))
        def srcb_impl(h, rj, h2bj, wbj, vbj, lgbj, g):
            def body(acc, args):
                ri, H2, w, vv, logc = args
                Mrows = jnp.take(h, ri, axis=0)          # [chunk/g, S_M]
                MbX = jnp.broadcast_to(Mrows[:, None, :],
                                       (Mrows.shape[0], g, t.S_M))
                MbX = MbX.reshape(-1, t.S_M)
                La = mop.m2l_sparse_pre(t, MbX, H2, w, logc)
                return acc + jnp.sum(La * vv[:, None], axis=0), None
            acc, _ = jax.lax.scan(body, jnp.zeros((t.S_Lt,), h.dtype),
                                  (rj, h2bj, wbj, vbj, lgbj))
            return acc

        def runb(h, g=g, a=(rj, h2bj, wbj, vbj, lgbj)):
            return srcb_impl(h, *a, g=g)
        tt = test_time_chained(chain(runb), mh, min_loop=2.0)
        print(f"srcbcast{g:<2d} : {tt * 1e3:8.2f} ms  (no scatter; "
              f"K2={K2p} waste x{K2p / K:.2f})", flush=True)


if __name__ == "__main__":
    main()
