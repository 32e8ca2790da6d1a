"""Compare tree-build modes at scale: native kd quickselect (host) vs the
device Morton sort.  Prints pair counts (tree quality), build timing, and
force accuracy for each, at the given (p, r).

Usage: python scripts/sortmode_probe.py [n] [p] [r]
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
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.7

    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err

    cfg = SimConfig(fmm_order=p, tree_radius=r)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg.omega0, x))
    pos_h, _ = ID.init_gaussian(n, x, u, dtype=np.float32)
    pos = jnp.asarray(pos_h)
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))
    ref = D.direct_kahan_targets(pos[sub], pos, cfg.eps2, cfg.kappa(n))

    for mode in ("kd_native", "kd_device", "morton"):
        eng = KdFmmEngine(cfg, n, sort_mode=mode)
        fs = eng.build(pos)          # warm-up/compile
        t0 = time.perf_counter()
        fs = eng.build(pos)
        t_build = time.perf_counter() - t0
        acc = eng.force(pos, fs)
        err = float(mean_rel_err(acc[sub], ref))
        print(f"{mode:10s}: build={t_build:.3f}s counts={eng.last_counts} "
              f"bt={ {k: round(v, 3) for k, v in eng.last_build_times.items()} } "
              f"err={err:.3e}", flush=True)


if __name__ == "__main__":
    main()
