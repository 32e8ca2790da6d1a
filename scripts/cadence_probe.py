"""Production rebuild-cadence probe: tree_steps x tree_resort_every x
tree_pipeline at the tuned headline config.

The round-4 bottleneck moved from the force program to the rebuild
pipeline: with a FULL re-sort submitted every boundary (K=1) the
background job (12 MB tunnel fetch + host kd + traversal) exceeds the
8-step scan window and the device stalls ~3 s per boundary
(bench BENCH_r04 window logs).  Knobs already in the engine:

  * tree_steps (ts): window length — longer windows hide more rebuild,
    cost window-end staleness error,
  * tree_resort_every (K): FULL re-sorts every K boundaries with cheap
    exact-bounds refreshes between (refresh fetches 1.2 MB of on-device
    leaf stats instead of 12 MB of positions),
  * tree_pipeline (D): boundaries between a full job's position snapshot
    and its adoption.

For each combo: median s/step over `windows` timed windows, plus the force
error at the END of the last window (maximally stale tree) against a fresh
2048-target Kahan oracle.

Usage: python scripts/cadence_probe.py [n] [p] [r] [boost]
       (combos hard-coded below; edit COMBOS to taste)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

COMBOS = [
    # (tree_steps, resort_every, pipeline)
    (8, 1, 2),     # bench round-4 shipping config
    (8, 4, 2),     # refresh between re-sorts
    (16, 1, 2),
    (16, 2, 2),
    (16, 4, 2),    # full job gets 2 long windows; 3 cheap refreshes between
    (16, 4, 3),
]
# env override, e.g. CO_CADENCE_COMBOS="8,4,2;16,4,2"
if os.environ.get("CO_CADENCE_COMBOS"):
    COMBOS = [tuple(int(v) for v in c.split(","))
              for c in os.environ["CO_CADENCE_COMBOS"].split(";")]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.67
    boost = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    os.environ["CO_SUB_BOOST"] = str(boost)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.simulate import Simulator

    cfg0 = SimConfig()
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg0.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state0 = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.zeros((n, 3), jnp.float32))
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048,
                                                      replace=False))

    for ts, K, Dp in COMBOS:
        cfg = cfg0.replace(fmm_order=p, tree_radius=r, tree_steps=ts,
                           tree_resort_every=K, tree_pipeline=Dp)
        sim = Simulator(cfg, n, engine="fmm3_kd")
        st = sim.init_acc(state0)
        st = sim.run(st, 2)
        st = sim.run(st, 2)
        # cross enough boundaries to absorb cap growth recompiles
        for _ in range(3):
            sim.advance_padded(2 * ts)
            jax.block_until_ready(sim._padded.pos)
        times = []
        for w in range(5):
            t0 = time.perf_counter()
            h = sim.advance_padded(2 * ts)
            np.asarray(h[0, 0])
            times.append((time.perf_counter() - t0) / (2 * ts))
            print(f"  ts={ts} K={K} D={Dp} window {w}: {times[-1]:.4f} "
                  f"s/step rebuild_wait="
                  f"{getattr(sim, 'last_rebuild_wait', -1):.3f}", flush=True)
        med = statistics.median(times)
        # window-end stale force error
        cur = sim.current_state()
        acc = sim._fmm.force(cur.pos, sim._fstate)
        ref = D.direct_kahan_targets(cur.pos[sub], cur.pos, cfg.eps2,
                                     cfg.kappa(n))
        err = float(mean_rel_err(acc[sub], ref))
        print("@@ " + json.dumps(
            {"ts": ts, "resort_every": K, "pipeline": Dp,
             "median_s_per_step": round(med, 4),
             "psteps_per_s": round(n / med, 0),
             "stale_err": err, "times": [round(t, 4) for t in times]}),
            flush=True)


if __name__ == "__main__":
    main()
