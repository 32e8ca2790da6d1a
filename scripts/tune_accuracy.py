"""Probe the (p, r) accuracy/throughput landscape at N=1M on TPU.

Informs bench.py's matched-accuracy headline (VERDICT item 3): the headline
config must have force_rel_err <= 1e-3 (the reference's default auto-tune
bound, main3.cu:236-237).  Prints one JSON line per config.

Usage: python scripts/tune_accuracy.py [n] [p,r ...]
       python scripts/tune_accuracy.py 1000000 3,1.7 4,2.0 5,2.0
"""

import json
import sys
import time

sys.path.insert(0, ".")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


def measure(n, p, r, steps=12):
    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.simulate import Simulator
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err

    config = SimConfig(fmm_order=p, tree_radius=r)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                          jnp.zeros((n, 3), jnp.float32))

    sim = Simulator(config, n, engine="fmm3_kd")
    t0 = time.perf_counter()
    state = sim.init_acc(state)
    build_s = time.perf_counter() - t0

    eng, fs = sim._fmm, sim._fstate
    acc_fmm = eng.force(state.pos, fs)
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))
    # Kahan-targets oracle: the plain f32 direct kernel's own accumulation
    # noise saturates ~2e-3 mean-relative at N=1M and would mask the FMM's
    # convergence entirely
    acc_ref = D.direct_kahan_targets(state.pos[sub], state.pos,
                                     config.eps2, config.kappa(n))
    err = float(mean_rel_err(acc_fmm[sub], acc_ref))

    # single force-eval time
    jax.block_until_ready(eng.force(state.pos, fs))
    t0 = time.perf_counter()
    for _ in range(3):
        out = eng.force(state.pos, fs)
    jax.block_until_ready(out)
    force_s = (time.perf_counter() - t0) / 3

    # amortized step time through the simulator
    warm = sim.run(state, 2)
    warm = sim.run(warm, 2)
    jax.block_until_ready(warm.pos)
    t0 = time.perf_counter()
    out = sim.run(warm, steps)
    np.asarray(out.pos[0])
    dt = (time.perf_counter() - t0) / steps

    print(json.dumps({
        "n": n, "p": p, "r": r, "err": err,
        "force_s": round(force_s, 4), "step_s": round(dt, 4),
        "psteps_per_s": round(n / dt, 1),
        "build_s": round(build_s, 3),
        "counts": eng.last_counts, "L": eng.L, "C": eng.st.C,
        "build_times": {k: round(v, 3)
                        for k, v in eng.last_build_times.items()},
    }), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    configs = [tuple(map(float, a.split(","))) for a in sys.argv[2:]]
    if not configs:
        configs = [(3, 1.7), (4, 1.7), (4, 2.0), (5, 1.7), (5, 2.0),
                   (6, 2.0)]
    for p, r in configs:
        measure(n, int(p), r)


if __name__ == "__main__":
    main()
