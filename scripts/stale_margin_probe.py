"""Temporal-MAC-slack sweep at the production cadence.

The staleness anatomy (docs/stale_anatomy_r05.json) showed the frozen
ACCEPTANCE SET dominates the within-window stale force error: with the
round-4 ship cadence the window-end error is 1.8e-2 with frozen lists but
2.3e-4 after a list re-traversal on the same permutation.  The cheap fix is
traversal-time slack: inflate node bounds by the expected within-window
drift (CO_STALE_MARGIN) so no accepted pair can become inadmissible and no
truly-near pair can be missing while the lists are frozen.

For each margin: build at the production cadence (geom_refresh on), prime
the pipeline, then measure the force error the production scan computes at
steps {0,4,8,12,16} of one window, the pair-count cost, and the production
s/step.

Usage: python scripts/stale_margin_probe.py [n] [p] [r] [margins csv]
  cadence via env CO_TS / CO_RESORT / CO_PIPE (default 16/2/2)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.43
    # each margin is a number (flat scalar slack), "auto" (per-axis rms
    # auto margin at the shipped factor), or "autoF<f>" (auto at factor f)
    margins = ([v if v.startswith("auto") else float(v)
                for v in sys.argv[4].split(",")]
               if len(sys.argv) > 4 else [0.0, 1e-4, 3e-4, 1e-3])
    ts = int(os.environ.get("CO_TS", "16"))
    K = int(os.environ.get("CO_RESORT", "2"))
    Dp = int(os.environ.get("CO_PIPE", "2"))
    builder = os.environ.get("CO_BUILDER", "host")   # host | kd_device
    if builder == "kd_device":
        os.environ["CO_SORT_MODE"] = "kd_device"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.simulate import Simulator

    cfg = SimConfig(fmm_order=p, tree_radius=r, tree_steps=ts,
                    tree_resort_every=K, tree_pipeline=Dp,
                    tree_async_build=("device" if builder != "host"
                                      else "host"))
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state0 = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.zeros((n, 3), jnp.float32))
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048,
                                                      replace=False))
    rows = []
    for m in margins:
        if isinstance(m, str) and m.startswith("auto"):
            # shipped default: Simulator derives the per-axis margin from
            # rms|v_ax|*dt*max_list_age*factor (config.stale_margin < 0)
            os.environ.pop("CO_STALE_MARGIN", None)
            if m.startswith("autoF"):
                os.environ["CO_STALE_MARGIN_FACTOR"] = m[5:]
            else:
                os.environ.pop("CO_STALE_MARGIN_FACTOR", None)
        else:
            os.environ["CO_STALE_MARGIN"] = str(m)
        sim = Simulator(cfg, n, engine="fmm3_kd")
        eng = sim._fmm
        st = sim.init_acc(state0)
        st = sim.run(st, 2)
        for _ in range(3):
            sim.advance_padded(ts)
            jax.block_until_ready(sim._padded.pos)
        counts = dict(eng.last_counts)
        caps = dict(eng.caps)

        def err_now():
            cur = sim.current_state()
            fs = eng.refresh_geometry_device(
                eng._pad_jit(cur.pos, sim._fstate), sim._fstate)
            acc = eng.force(cur.pos, fs)
            ref = D.direct_kahan_targets(cur.pos[sub], cur.pos, cfg.eps2,
                                         cfg.kappa(n))
            return float(mean_rel_err(acc[sub], ref))

        errs = {}
        tstep = []
        done = 0
        for stp in (0, 4, 8, 12, 16):
            if stp > done:
                t0 = time.perf_counter()
                sim.advance_padded(stp - done)
                jax.block_until_ready(sim._padded.pos)
                tstep.append((time.perf_counter() - t0) / (stp - done))
                done = stp
            errs[stp] = err_now()
            print(f"  margin={m} step={stp}: err={errs[stp]:.3e}",
                  flush=True)
        # one clean timed window after the error evals
        t0 = time.perf_counter()
        h = sim.advance_padded(ts)
        np.asarray(h[0, 0])
        sps = (time.perf_counter() - t0) / ts
        row = {"margin": m, "errs": errs,
               "resolved_margin": np.asarray(
                   getattr(eng, "stale_margin_abs", 0.0)).tolist(),
               "window_mean": float(np.mean(list(errs.values()))),
               "counts": counts, "caps": {k: int(v) if not isinstance(v, dict)
                                          else v for k, v in caps.items()},
               "s_per_step": round(sps, 4),
               "psteps_per_s": round(n / sps, 0)}
        rows.append(row)
        print("@@ " + json.dumps(row), flush=True)

    path = (f"docs/stale_margin_r05_ts{ts}K{K}D{Dp}_{builder}.json"
            if os.environ.get("CO_TS") or builder != "host"
            else "docs/stale_margin_r05.json")
    if any(isinstance(m, str) and m.startswith("auto") for m in margins):
        path = path.replace(".json", "_auto.json")
    with open(path, "w") as f:
        json.dump({"config": {"n": n, "p": p, "r": r, "ts": ts,
                              "resort_every": K, "pipeline": Dp,
                              "builder": builder},
                   "rows": rows}, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
