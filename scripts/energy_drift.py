"""North-star metric: relative energy drift over 10k leapfrog steps
(BASELINE.md: target <= 1e-6 on one TPU chip).

Usage: python scripts/energy_drift.py [n] [steps] [engine]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.models import oscillator as M
    from coulomb_oscillators_tpu.simulate import Simulator

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30001
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    engine = sys.argv[3] if len(sys.argv) > 3 else "fmm3_kd"
    p_order = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    radius = float(sys.argv[5]) if len(sys.argv) > 5 else 2.0

    config = SimConfig(fmm_order=p_order, tree_radius=radius)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                          jnp.zeros((n, 3), jnp.float32))

    sim = Simulator(config, n, engine=engine)
    state = sim.init_acc(state)

    def energy(st):
        if n > 200_000 and sim._fmm is not None:
            return float(M.total_energy_fmm(config, st, sim._fmm,
                                            sim._fmm.build(st.pos)))
        return float(M.total_energy(config, st))

    e0 = energy(state)
    print(f"n={n} engine={engine} E0={e0:.9e}", flush=True)

    t0 = time.time()
    done = 0
    block = 1000
    while done < steps:
        k = min(block, steps - done)
        state = sim.run(state, k)
        done += k
        e = energy(state)
        drift = abs(e - e0) / abs(e0)
        dt = time.time() - t0
        print(f"step {done:6d}  E={e:.9e}  drift={drift:.3e}  "
              f"({done * n / dt / 1e6:.2f} M psteps/s)", flush=True)

    print(f"FINAL drift after {steps} steps: {drift:.3e}")


if __name__ == "__main__":
    main()
