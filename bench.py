"""Benchmark: prints ONE JSON line with the flagship metric.

Headline (BASELINE.json): N=1M 3D kd-tree FMM particle-steps/s on one chip,
with the tree rebuilt every `tree_steps` steps (reference temporal
amortization) and leapfrog stepping — **at matched accuracy**: the headline
config is auto-tuned over the reference's FULL grid (p in 1..6 x
r in {1.11, 1.25, 1.43, 1.67, 2, 2.5, 3}, main3.cu:739-741) keeping the
fastest config whose mean relative force error vs the Kahan-targets direct
oracle is <= 1e-3 (the reference default bound, main3.cu:236-237).

Reproducibility (round-2 verdict): timing is median-of-5 windows with the
per-window times and spread reported in `extra`; the kd sort/geometry is
shared across the autotune grid (the tree does not depend on p or r), so
the full 42-config grid costs one build + 42 traversals/error probes.
"""

import json
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

ERR_BOUND = 1e-3           # reference default (main3.cu:236-237)
SEARCH_P = [1, 2, 3, 4, 5, 6]
SEARCH_R = [1.11, 1.25, 1.43, 1.67, 2.0, 2.5, 3.0]


def _init_state(n):
    from coulomb_oscillators_tpu import ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu import SimConfig

    config = SimConfig()
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    return ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                         jnp.zeros((n, 3), jnp.float32))


def _time_steps(sim, state, steps=16, repeats=5):
    """Median-of-`repeats` window timing (transport stalls on the remote
    TPU tunnel would otherwise pollute single samples)."""
    warm = sim.run(state, 2)
    warm = sim.run(warm, 2)   # second warm-up: compile for scan-layout inputs
    jax.block_until_ready(warm.pos)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        warm = sim.run(warm, steps)
        np.asarray(warm.pos[0])
        times.append((time.perf_counter() - t0) / steps)
    return times


def autotune(state, n, base):
    """Reference -accuracy grid search sharing one kd sort/geometry.

    Compile economy (this host pays MINUTES per large remote XLA compile):
    the compiled force program depends on p (tables) and the padded list
    caps — NOT on r — so for each p all radii are traversed first, the
    caps are pre-maxed, and the whole r-sweep then reuses ONE compiled
    program (6 big compiles for the 42-config grid instead of 42)."""
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
    from coulomb_oscillators_tpu.ops.fmm.kdtree import _round_cap
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.utils.timing import test_time_chained
    from coulomb_oscillators_tpu import native as conative

    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))
    # Kahan-targets oracle (direct3 semantics): the plain f32 direct kernel
    # has ~2e-3 of its own accumulation noise at N=1M
    acc_ref = D.direct_kahan_targets(state.pos[sub], state.pos,
                                     base.eps2, base.kappa(n))
    jax.block_until_ready(acc_ref)

    # shared tree: the kd permutation/geometry depend only on (n, L)
    geo_cache = {}

    def shared_geo(eng, pos):
        key = eng.L
        if key not in geo_cache:
            pos_h = np.asarray(pos, dtype=np.float32)
            perm = conative.kdtree_build(pos_h, eng.L)
            pos_s = pos_h[perm]
            geom = conative.node_geometry(pos_s, eng.L)
            inv = np.empty_like(perm)
            inv[perm] = np.arange(n, dtype=perm.dtype)
            geo_cache[key] = (perm, inv, geom)
        return geo_cache[key]

    best = None
    tried = []
    for p in SEARCH_P:
        eng = KdFmmEngine(base.replace(fmm_order=p, tree_radius=SEARCH_R[0]),
                          n)
        perm, inv, (c_h, lb_h, rb_h, lam_h) = shared_geo(eng, state.pos)
        # pre-pass: traverse every radius, pre-max the caps so the whole
        # r-sweep shares one compiled program
        lists = {}
        for r in SEARCH_R:
            eng.config = base.replace(fmm_order=p, tree_radius=r)
            lists[r] = eng._traverse(c_h, lb_h, rb_h)
        eng.caps["m2l"] = _round_cap(
            max(m.shape[0] for m, _ in lists.values()), eng.m2l_chunk, 1.08)
        eng.caps["p2p"] = _round_cap(
            max(q.shape[0] for _, q in lists.values()), 8192, 1.25)
        dmax = 1
        for _, q in lists.values():
            if q.shape[0]:
                deg = int(np.bincount(q[:, 0].astype(np.int64)).max())
                dmax = max(dmax, deg)
        eng.caps["dmax"] = -(-max(128, dmax) // 128) * 128
        for r in SEARCH_R:
            eng.config = base.replace(fmm_order=p, tree_radius=r)
            m2l, p2p = lists[r]
            fs = eng._lists_to_state(perm, inv, c_h, lam_h, m2l, p2p, {})
            err = float(mean_rel_err(eng.force(state.pos, fs)[sub], acc_ref))
            row = {"p": p, "r": r, "err": err}
            if err < ERR_BOUND:
                def fpad(x, eng=eng, fs=fs):
                    return x + eng._force_jit(x, fs) * 1e-30
                t = test_time_chained(fpad, state.pos, min_loop=1.5)
                row["force_s"] = round(t, 4)
                if best is None or t < best["force_s"]:
                    best = {"p": p, "r": r, "err": err, "force_s": t}
            tried.append(row)
            print(f"# p={p} r={r} err={err:.2e}"
                  + (f" t={row.get('force_s')}" if "force_s" in row else ""),
                  flush=True)
    return best, tried


def main():
    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.simulate import Simulator

    n = 1_000_000
    state = _init_state(n)
    base = SimConfig()

    best, tried = autotune(state, n, base)
    if best is None:
        print(json.dumps({"metric": "error", "value": -1,
                          "unit": "autotune_failed", "vs_baseline": None}))
        return

    config = base.replace(fmm_order=best["p"], tree_radius=best["r"])
    sim = Simulator(config, n, engine="fmm3_kd")
    state = sim.init_acc(state)
    times = _time_steps(sim, state, steps=16, repeats=5)
    med = statistics.median(times)
    value = n / med

    out = {
        "metric": "particle_steps_per_s",
        "value": round(value, 0),
        "unit": "psteps/s",
        "vs_baseline": None,   # reference publishes no numbers (BASELINE.md)
        "extra": {
            "n": n, "p": best["p"], "r": best["r"],
            "force_rel_err": round(best["err"], 6),
            "err_bound": ERR_BOUND,
            "sec_per_step_median": round(med, 4),
            "sec_per_step_all": [round(t, 4) for t in times],
            "tree_steps": config.tree_steps,
            "integrator": config.integrator,
            "autotune_grid": tried,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
