"""Feasibility analysis for a windowed-contiguous M2L gather.

The M2L multipole gather is row-issue-bound (~148 ms of the 200 ms
isolated stage at N=1M p=6; docs/ROOFLINE.md).  A windowed
reformulation replaces the per-entry row gather with, per chunk of
target-sorted entries, one contiguous dynamic_slice of the heap
(window) + an in-window gather expressed as a one-hot matmul on the
MXU.  It is feasible iff the per-chunk source-index window
(max src - min src + 1) is bounded for real trees.

This script builds the production entry lists (host-side; runs on CPU)
and prints the window distribution per chunk size, plus the same when
entries are bucketed by SOURCE level first (windows cannot straddle a
level boundary in the heap layout, which otherwise inflates them).

Run: JAX_PLATFORMS=cpu python scripts/m2l_window_stats.py [N] [p] [r]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from coulomb_oscillators_tpu import SimConfig
from coulomb_oscillators_tpu.models import init_dist as ID
from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
from coulomb_oscillators_tpu.ops.fmm.kdtree import _heap_off


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.43

    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)

    eng = KdFmmEngine(cfg, n)
    fs = eng.build(jnp.asarray(pos_h))
    L = eng.L

    src = np.asarray(fs.m2l_src)
    tgt = np.asarray(fs.m2l_tgt)
    val = np.asarray(fs.m2l_valid).astype(bool)
    sv = src[val]
    tv = tgt[val]
    K = len(sv)
    print(f"n={n} p={p} r={r} L={L} K(valid)={K} cap={len(src)}")

    # level of each source heap index
    offs = np.array([_heap_off(l) for l in range(L + 2)])
    lev = np.searchsorted(offs, sv, side="right") - 1
    counts = np.bincount(lev, minlength=L + 1)
    print("entries per source level:",
          {l: int(c) for l, c in enumerate(counts) if c})

    for chunk in (1024, 2048, 4096, 8192):
        nch = K // chunk
        s2 = sv[: nch * chunk].reshape(nch, chunk)
        w = s2.max(axis=1) - s2.min(axis=1) + 1
        print(f"chunk={chunk:5d} (target-sorted): window p50={int(np.percentile(w, 50))} "
              f"p90={int(np.percentile(w, 90))} p99={int(np.percentile(w, 99))} "
              f"max={int(w.max())}")

    # source-major ordering: sort entries by src (scatter then becomes the
    # random side, but the LOCAL heap rows are smaller: S_Lt vs S_M reads)
    order = np.argsort(sv, kind="stable")
    ss = sv[order]
    for chunk in (2048, 8192):
        nch = K // chunk
        s2 = ss[: nch * chunk].reshape(nch, chunk)
        w = s2.max(axis=1) - s2.min(axis=1) + 1
        t2 = tv[order][: nch * chunk].reshape(nch, chunk)
        wt = t2.max(axis=1) - t2.min(axis=1) + 1
        print(f"chunk={chunk:5d} (source-sorted): src-window p99={int(np.percentile(w, 99))} "
              f"max={int(w.max())}; tgt-window p50={int(np.percentile(wt, 50))} "
              f"p99={int(np.percentile(wt, 99))} max={int(wt.max())}")

    # (lev_t, lev_s, t, s) bucketed ordering — the round-5 windowed-gather
    # candidate: within one (target level, source level) bucket sorted by
    # target, consecutive entries have contiguous targets AND spatially
    # local sources (kd in-level order is spatial), so BOTH windows are
    # bounded.  Chunks are padded to bucket boundaries, so also report the
    # bucket-padding waste per chunk size.
    lev_t = np.searchsorted(offs, tv, side="right") - 1
    order2 = np.lexsort((sv, tv, lev, lev_t))
    s3 = sv[order2]
    t3 = tv[order2]
    key_b = lev_t[order2] * 64 + lev[order2]
    bnd = np.flatnonzero(np.diff(key_b)) + 1
    bounds = np.concatenate([[0], bnd, [K]])
    nbuckets = len(bounds) - 1
    print(f"(lev_t,lev_s) buckets with entries: {nbuckets}")
    for chunk in (1024, 2048, 4096, 8192):
        sw, tw, padded = [], [], 0
        for b in range(nbuckets):
            lo, hi = bounds[b], bounds[b + 1]
            kb = hi - lo
            padded += -(-kb // chunk) * chunk
            for c0 in range(lo, hi, chunk):
                c1 = min(c0 + chunk, hi)
                sw.append(int(s3[c0:c1].max() - s3[c0:c1].min() + 1))
                tw.append(int(t3[c0:c1].max() - t3[c0:c1].min() + 1))
        sw, tw = np.array(sw), np.array(tw)
        print(f"chunk={chunk:5d} (lev-bucketed): src-window p50={int(np.percentile(sw,50))} "
              f"p90={int(np.percentile(sw,90))} p99={int(np.percentile(sw,99))} "
              f"max={sw.max()}; tgt-window p99={int(np.percentile(tw,99))} "
              f"max={tw.max()}; bucket-pad waste={(padded-K)/K:.3f}")


if __name__ == "__main__":
    main()
