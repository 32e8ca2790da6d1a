"""Benchmark: prints ONE JSON line with the flagship metric.

Round-1 flagship: direct-engine (Pallas) particle-steps/s at N=65536 on one
chip.  As the FMM stack lands this switches to the BASELINE.json headline
config (N=1M 3D traceless FMM).  vs_baseline is the ratio against the
reference's published number — the reference publishes none (BASELINE.md), so
we report the ratio against our own first recorded TPU number once present.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.models import integrators as I
    from coulomb_oscillators_tpu.models import oscillator as M
    from coulomb_oscillators_tpu.state import ParticleState
    from coulomb_oscillators_tpu.utils.timing import test_time_chained

    n = 65536
    config = SimConfig()
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                          jnp.zeros_like(jnp.asarray(pos)))
    state = M.init_accelerations(config, state)

    step = M.make_step_fn(config, n, engine="direct", integrator="leapfrog")

    # warm-up + time (reference harness semantics, main3.cu:707-735);
    # chained so each step depends on the previous (true device time).
    sec_per_step = test_time_chained(step, state, min_loop=2.0)

    psteps = n / sec_per_step
    ginter = (n * n) / sec_per_step / 1e9
    print(json.dumps({
        "metric": "direct_N65536_particle_steps_per_s",
        "value": round(psteps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": 1.0,
        "extra": {
            "pair_interactions_G_per_s": round(ginter, 2),
            "sec_per_step": sec_per_step,
            "n": n,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
