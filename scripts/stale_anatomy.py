"""Staleness anatomy at the production cadence: what makes the 3.5e-2?

Round-4 shipped (ts=16, resort_every=2, pipeline=2) with a window-end
stale force error ~3.5e-2 vs the 9.7e-4 fresh-tree bound, and the boost
probe showed MAC margin does NOT reduce it.  This probe decomposes the
within-window error by swapping in selectively-fresh state at every step
of one production window:

  prod : the production FmmState exactly as the scan sees it
  geo  : refresh_geometry_device(ppad, fs) — node centers/lam and the
         folded M2L harmonics recomputed from CURRENT positions on
         device; permutation and pair lists frozen
  rfsh : eng.refresh(ppad, fs) — fresh exact bounds AND fresh MAC lists
         (host traverse); permutation frozen        [first/last step only]
  fresh: full rebuild                               [last step only]

If geo ~ fresh, the staleness is expansion geometry and a device-side
geometry refresh inside the reuse window closes the production-accuracy
gap at ~zero host cost.  (Reference -test2 drift analogue:
main3.cu:812-831.)

Usage: python scripts/stale_anatomy.py [n] [p] [r] [boost]
  cadence via env CO_TS / CO_RESORT / CO_PIPE (default 16/2/2)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.43
    boost = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    os.environ["CO_SUB_BOOST"] = str(boost)
    ts = int(os.environ.get("CO_TS", "16"))
    K = int(os.environ.get("CO_RESORT", "2"))
    Dp = int(os.environ.get("CO_PIPE", "2"))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from coulomb_oscillators_tpu import SimConfig, ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.simulate import Simulator
    from coulomb_oscillators_tpu.utils.timing import test_time_chained

    # geom_refresh off: the probe measures the FROZEN-geometry production
    # cadence ("prod") against selectively-fresh state; the in-scan
    # refresh that this probe motivated is config.geom_refresh (default on)
    cfg = SimConfig(fmm_order=p, tree_radius=r, tree_steps=ts,
                    tree_resort_every=K, tree_pipeline=Dp,
                    geom_refresh=False)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    state0 = ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.zeros((n, 3), jnp.float32))
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048,
                                                      replace=False))

    sim = Simulator(cfg, n, engine="fmm3_kd")
    eng = sim._fmm
    st = sim.init_acc(state0)
    st = sim.run(st, 2)
    # prime the pipeline to production staleness
    for _ in range(3):
        sim.advance_padded(ts)
        jax.block_until_ready(sim._padded.pos)

    def err_vs_oracle(fs):
        cur = sim.current_state()
        acc = eng.force(cur.pos, fs)
        ref = D.direct_kahan_targets(cur.pos[sub], cur.pos, cfg.eps2,
                                     cfg.kappa(n))
        return float(mean_rel_err(acc[sub], ref))

    # cost of the device geometry refresh program (the production lever)
    fs0 = sim._fstate
    gcost = test_time_chained(
        lambda pp: pp
        + eng.refresh_geometry_device(pp, fs0).center.sum() * 1e-30,
        sim._padded.pos, min_loop=2.0)
    print(f"refresh_geometry_device: {gcost * 1e3:.1f} ms/call", flush=True)

    rows = []
    for i in range(ts + 1):
        row = {"step": i}
        row["prod"] = err_vs_oracle(sim._fstate)
        fs_g = eng.refresh_geometry_device(sim._padded.pos, sim._fstate)
        row["geo"] = err_vs_oracle(fs_g)
        if i in (0, ts):
            t0 = time.perf_counter()
            fs_r = eng.refresh(sim._padded.pos, sim._fstate)
            row["rfsh"] = err_vs_oracle(fs_r)
            row["rfsh_s"] = round(time.perf_counter() - t0, 2)
        if i == ts:
            cur = sim.current_state()
            fs_f = eng.build(cur.pos)
            row["fresh"] = err_vs_oracle(fs_f)
        rows.append(row)
        print("  " + json.dumps(row), flush=True)
        if i < ts:
            sim.advance_padded(1)
            jax.block_until_ready(sim._padded.pos)

    out = {
        "config": {"n": n, "p": p, "r": r, "boost": boost, "ts": ts,
                   "resort_every": K, "pipeline": Dp},
        "geom_refresh_ms": round(gcost * 1e3, 1),
        "ladder": rows,
        "window_mean_prod": float(np.mean([x["prod"] for x in rows])),
        "window_mean_geo": float(np.mean([x["geo"] for x in rows])),
    }
    with open("docs/stale_anatomy_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("@@ " + json.dumps({k: v for k, v in out.items()
                              if k != "ladder"}), flush=True)


if __name__ == "__main__":
    main()
