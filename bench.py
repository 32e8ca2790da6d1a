"""Benchmark: prints ONE JSON line with the flagship metric.

Headline (BASELINE.json): N=1M 3D kd-tree FMM particle-steps/s on one chip,
with the tree rebuilt every `tree_steps` steps (reference temporal
amortization) and leapfrog stepping.  Also reports the P2P+M2L pair
interaction rate and the measured force accuracy vs the Kahan direct oracle
on a subsample.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.simulate import Simulator
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err

    n = 1_000_000
    config = SimConfig(fmm_order=3, tree_radius=1.7)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                          jnp.zeros((n, 3), jnp.float32))

    sim = Simulator(config, n, engine="fmm3_kd")
    state = sim.init_acc(state)

    # accuracy: FMM vs the Pallas direct engine (itself ~1e-7 vs Kahan) on
    # the full state, compared over a 2048-target subsample
    eng = sim._fmm
    fs = sim._fstate
    acc_fmm = eng.force(state.pos, fs)
    acc_ref = D.direct(state.pos, config.eps2, config.kappa(n))
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))
    err = float(mean_rel_err(acc_fmm[sub], acc_ref[sub]))

    # timing: steps chained through the simulator (includes rebuild cost
    # every tree_steps steps)
    warm = sim.run(state, 2)
    warm = sim.run(warm, 2)   # second warm-up: compile for scan-layout inputs
    jax.block_until_ready(warm.pos)
    t0 = time.perf_counter()
    steps = 16
    out = sim.run(warm, steps)
    np.asarray(out.pos[0])
    dt = (time.perf_counter() - t0) / steps

    psteps = n / dt
    pair_count = sim._fmm.last_counts
    C = eng.st.C
    ginter = (pair_count["p2p"] * C * C) / dt / 1e9
    print(json.dumps({
        "metric": "fmm3_kd_N1M_particle_steps_per_s",
        "value": round(psteps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": 1.0,
        "extra": {
            "sec_per_step": dt,
            "force_rel_err_vs_direct": err,
            "p2p_G_interactions_per_s": round(ginter, 2),
            "n": n, "p": config.fmm_order, "r": config.tree_radius,
            "L": eng.L, "leaf_cap": C,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
