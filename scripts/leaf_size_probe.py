"""Probe: near/far pair counts and implied P2P lane-work vs tree depth L.

The round-2 engine fixed leaf_target=128 (lane width).  The MAC near-field
ball scales with leaf diameter, so C=128 leaves do ~C x more physical
near-field interactions per particle than the reference's ~p^2-particle
leaves.  This prints, per L: leaf capacity C, p2p/m2l pair counts, total
physical interactions (sum mult_i*mult_j), and lane-interactions for tile
sizes 128 (sibling-packed) and C (ideal).

Run: python scripts/leaf_size_probe.py [N] [p] [r]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np

from coulomb_oscillators_tpu import SimConfig
from coulomb_oscillators_tpu.models import init_dist as ID
from coulomb_oscillators_tpu.ops.fmm.kdtree import KdFmmEngine, _heap_off
from coulomb_oscillators_tpu import native as conative


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)

    for L in (12, 13, 14, 15, 16):
        eng = KdFmmEngine(cfg, n, L=L, use_pallas=False)
        t0 = time.perf_counter()
        perm = conative.kdtree_build(pos_h, L)
        pos_s = pos_h[perm]
        c_h, lb_h, rb_h, lam_h = conative.node_geometry(pos_s, L)
        m2l, p2p = eng._traverse(c_h, lb_h, rb_h)
        dt = time.perf_counter() - t0
        G = 1 << L
        C = -(-n // G)
        leaf0 = _heap_off(L)
        mult = eng.st.mult[leaf0:].astype(np.int64)
        ti, si = p2p[:, 0], p2p[:, 1]
        phys = int(np.sum(mult[ti] * mult[si]))
        q = p2p.shape[0]
        deg = np.bincount(ti, minlength=G)
        lane128 = q * 128 * 128          # current: both dirs, tiles 128x128
        Cpad = -(-C // 8) * 8
        laneC = q * Cpad * Cpad
        print(f"L={L:2d} C={C:4d} p2p={q:8d} m2l={m2l.shape[0]:8d} "
              f"deg(mean/max)={deg.mean():6.1f}/{deg.max():5d} "
              f"phys={phys/1e9:6.2f}G lane128={lane128/1e9:7.1f}G "
              f"laneC={laneC/1e9:7.1f}G build={dt:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
