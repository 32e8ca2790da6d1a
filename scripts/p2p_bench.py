"""Near-field (P2P) kernel shootout at scale: jnp scan (diff form) vs
MXU-assembled form vs the Pallas VMEM-resident kernel.

Decides the default near-field path (VERDICT item 5).  Prints per-variant
time, lane-interaction rate, and max deviation vs the diff form.

Run from /root/repo: python scripts/p2p_bench.py [N] [p] [r]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu import SimConfig
from coulomb_oscillators_tpu.models import init_dist as ID
from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
from coulomb_oscillators_tpu.utils.timing import test_time_chained


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)
    pos = jnp.asarray(pos_h)

    variants = {
        "diff": dict(use_pallas=False),
        "pallas": dict(use_pallas=True),
        "stream": dict(use_pallas=True, streaming=True),
    }
    results = {}
    ref_unpad = None
    for name, kw in variants.items():
        kw = dict(kw)
        streaming = kw.pop("streaming", False)
        eng = KdFmmEngine(cfg, n, **kw)
        if streaming:
            eng.p2p_streaming = True
        fs = eng.build(pos)
        st = eng.st
        G, C, dim = 1 << eng.L, st.C, eng.dim
        pad_mask = jnp.asarray(st.pad_mask)
        pos_s = jnp.take(pos, fs.perm, axis=0)
        flat = jnp.where(pad_mask[:, None],
                         jnp.take(pos_s, jnp.asarray(st.pad_gather), axis=0),
                         jnp.float32(1e18))
        ppad0 = flat.reshape(G, C, dim)

        @jax.jit
        def p2p(ppad, eng=eng, fs=fs):
            f = eng._stage_p2p(ppad, fs)
            return ppad + f * 1e-30, f

        def chained(x, p2p=p2p):
            return p2p(x)[0]

        t = test_time_chained(chained, ppad0, min_loop=3.0)
        q = int(np.sum(np.asarray(fs.p2p_valid)))
        gint = q * C * C / t / 1e9
        # unpadded acceleration for cross-variant comparison
        f = p2p(ppad0)[1]
        acc = np.asarray(
            jnp.take(f.reshape(G * C, dim), jnp.asarray(st.unpad_gather),
                     axis=0)[jnp.argsort(fs.perm)] if False else
            jnp.take(jnp.take(f.reshape(G * C, dim),
                              jnp.asarray(st.unpad_gather), axis=0),
                     fs.inv_perm, axis=0))
        if ref_unpad is None:
            ref_unpad = acc
            dev = 0.0
        else:
            scale = np.abs(ref_unpad).max()
            dev = float(np.abs(acc - ref_unpad).max() / scale)
        results[name] = (t, gint, dev, q, C)
        print(f"{name:7s}: {t * 1e3:8.2f} ms  {gint:7.1f} G lane-int/s  "
              f"C={C} pairs={q}  max_dev={dev:.2e}", flush=True)
        assert dev < 1e-5, f"{name} disagrees with diff form: {dev}"


if __name__ == "__main__":
    main()
