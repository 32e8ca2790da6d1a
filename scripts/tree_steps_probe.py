"""Temporal-amortization knob: throughput + staleness cost vs tree_steps.

For each tree_steps value: amortized step time at the matched-accuracy
headline config, plus the force error measured at the END of a reuse
window (the maximally stale point) against the Kahan-targets oracle.

Usage: python scripts/tree_steps_probe.py [n] [p] [r] [ts ...]
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
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    ts_list = [int(a) for a in sys.argv[4:]] or [8, 16, 32]

    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.simulate import Simulator

    x = (0.003, 0.001, 0.01)
    cfg0 = SimConfig()
    u = tuple(w * xs for w, xs in zip(cfg0.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state0 = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.zeros((n, 3), jnp.float32))
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))

    for ts in ts_list:
        cfg = SimConfig(fmm_order=p, tree_radius=r, tree_steps=ts)
        sim = Simulator(cfg, n, engine="fmm3_kd")
        st = sim.init_acc(state0)
        # run to the END of a reuse window; measure stale-tree force error
        st = sim.run(st, ts)
        eng, fs = sim._fmm, sim._fstate
        acc = eng.force(st.pos, fs)
        ref = D.direct_kahan_targets(st.pos[sub], st.pos, cfg.eps2,
                                     cfg.kappa(n))
        err_stale = float(mean_rel_err(acc[sub], ref))
        # amortized timing, min-of-2
        warm = sim.run(st, 2)
        warm = sim.run(warm, 2)
        jax.block_until_ready(warm.pos)
        best = float("inf")
        steps = 2 * ts
        for _ in range(2):
            t0 = time.perf_counter()
            warm = sim.run(warm, steps)
            np.asarray(warm.pos[0])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(f"tree_steps={ts:3d}: {n / best / 1e6:5.2f} M psteps/s "
              f"({best * 1e3:6.1f} ms/step)  stale-window err={err_stale:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
