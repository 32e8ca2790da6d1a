"""Benchmark: prints ONE JSON line with the flagship metric.

Headline (BASELINE.json): N=1M 3D kd-tree FMM particle-steps/s on one chip,
with the tree rebuilt every `tree_steps` steps (reference temporal
amortization) and leapfrog stepping — **at matched accuracy**: the headline
config is auto-tuned over the reference's FULL grid (p in 1..6 x
r in {1.11, 1.25, 1.43, 1.67, 2, 2.5, 3}, main3.cu:739-741) keeping the
fastest config whose mean relative force error vs the Kahan-targets direct
oracle is <= 1e-3 (the reference default bound, main3.cu:236-237).

Reproducibility (round-2 verdict): timing is median-of-5 windows with the
per-window times and spread reported in `extra`; radii are swept descending
per order with an early stop at the error bound (force error is monotone
decreasing in r at fixed p), which prunes the un-winnable configs.

Selection (round-3 fix): each passing config is scored by its PRODUCTION
cost — padded force eval + rebuild/tree_steps — and the top 3 scores get a
real production-scan timing; the fastest median wins.  Scoring by the
isolated force eval alone picked p=4 r=3.0 (force_s 0.59 < p=5 r=2.0's
0.73) whose giant r=3.0 pair lists make every window rebuild cost seconds:
5-20 s/step in production vs 0.2 for the true winner.

Process isolation (round-3): every expansion order's grid sweep and the
final headline timing each run in their OWN subprocess.  A long-lived
process accumulates compiled executables and fragments the ~16 GB HBM
arena until a p=5 M2L-geometry upload (~3 GB) fails with
RESOURCE_EXHAUSTED even though the live-array footprint is near zero —
fresh processes sidestep both, and the persistent XLA disk cache
(utils/cache.py) makes respawns cheap.  Child phases are invoked as
`python bench.py gridp <p>` / `python bench.py final <p> <r> <err>` and
emit machine lines prefixed with `@@`.
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

ERR_BOUND = 1e-3           # reference default (main3.cu:236-237)
SEARCH_P = [1, 2, 3, 4, 5, 6]
SEARCH_R = [1.11, 1.25, 1.43, 1.67, 2.0, 2.5, 3.0]
# third grid axis (TPU-native, no reference analogue): the sub-block MAC
# acceptance-radius boost.  Lower boost = looser sub-leaf MAC = much less
# near-field work but more error (err falls ~boost^(p+1)); descending from
# the accuracy-safe default stops at the first over-bound value.  The
# compiled force program is boost-independent (same caps/shapes), so the
# extra probes cost traversals + error evals, not compiles.
SEARCH_BOOST = [1.5, 1.3, 1.15, 1.0]


def _init_state(n):
    import numpy as np
    import jax.numpy as jnp
    from coulomb_oscillators_tpu import ParticleState
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu import SimConfig

    config = SimConfig()
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(config.omega0, x))
    pos, vel = ID.init_gaussian(n, x, u, dtype=np.float32)
    return ParticleState(jnp.asarray(pos), jnp.asarray(vel),
                         jnp.zeros((n, 3), jnp.float32))


# --------------------------------------------------------------------------
# child phase 1: grid sweep for ONE expansion order
# --------------------------------------------------------------------------

def grid_for_p(p, n=1_000_000, r_skip=0):
    """Sweep radii DESCENDING at fixed p; print one `@@ {...}` row per
    config.  Error is monotone decreasing in r at fixed p (opening-angle
    monotonicity — every measured grid confirms it), so the descent stops
    once the error clears the bound.

    Each passing row also measures `rebuild_s` (steady-state MAC traversal
    + list prep + upload): the selection metric is the PRODUCTION cost
    force_s + rebuild_s / tree_steps — an isolated force timing alone picks
    huge-radius configs whose per-window rebuild (giant pair lists) costs
    many times the force eval (measured: p=4 r=3.0 wins on force_s 0.59 but
    runs 5-20 s/step in production).

    On HBM exhaustion the child EXITS (code 17) after printing the oom row:
    a fresh engine in the same process is not enough — the arena stays
    fragmented/wedged and every later radius OOMs too (p=6 round-3 run).
    The parent respawns the sweep at the next smaller radius."""
    import gc
    import time as _time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.ops import direct as D
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine
    from coulomb_oscillators_tpu.ops.reductions import mean_rel_err
    from coulomb_oscillators_tpu.utils.timing import test_time_chained
    from coulomb_oscillators_tpu import native as conative

    base = SimConfig()
    state = _init_state(n)
    sub = jnp.asarray(np.random.default_rng(0).choice(n, 2048, replace=False))
    # Kahan-targets oracle (direct3 semantics): the plain f32 direct kernel
    # has ~2e-3 of its own accumulation noise at N=1M
    acc_ref = D.direct_kahan_targets(state.pos[sub], state.pos,
                                     base.eps2, base.kappa(n))
    jax.block_until_ready(acc_ref)

    def fresh_engine():
        return KdFmmEngine(base.replace(fmm_order=p, tree_radius=SEARCH_R[-1]),
                           n)

    eng = fresh_engine()
    pos_h = np.asarray(state.pos, dtype=np.float32)
    perm = conative.kdtree_build(pos_h, eng.L)
    pos_s = pos_h[perm]
    c_h, lb_h, rb_h, lam_h = conative.node_geometry(pos_s, eng.L)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=perm.dtype)

    over_bound = 0
    for r in list(reversed(SEARCH_R))[r_skip:]:
        eng.config = base.replace(fmm_order=p, tree_radius=r)
        first_err = None
        boosts = SEARCH_BOOST if eng.sub_depth else [1.0]
        for b in boosts:
            eng.mac_sub_boost = b if eng.sub_depth else 1.0
            t0 = _time.perf_counter()
            m2l, p2p = eng._traverse(c_h, lb_h, rb_h)
            t_trav = _time.perf_counter() - t0
            fs = None
            try:
                fs = eng._lists_to_state(perm, inv, c_h, lam_h, m2l, p2p, {})
                err = float(mean_rel_err(eng.force(state.pos, fs)[sub],
                                         acc_ref))
            except Exception as e:  # noqa: BLE001 — only HBM exhaustion
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                print("@@ " + json.dumps({"p": p, "r": r, "boost": b,
                                          "err": None, "oom": True}),
                      flush=True)
                sys.exit(17)  # arena is wedged; parent respawns at next r
            if first_err is None:
                first_err = err
            row = {"p": p, "r": r, "boost": b, "err": err}
            if err < ERR_BOUND:
                # time the PADDED force program — the one the production
                # scan dispatches per step (the 3-program force() path adds
                # pad/unpad dispatch overhead the scan never pays)
                ppad = eng._pad_jit(state.pos, fs)

                def fpad(x, eng=eng, fs=fs):
                    return x + eng._padded_force_jit(x, fs) * 1e-30
                t = test_time_chained(fpad, ppad, min_loop=1.5)
                row["force_s"] = round(t, 4)
                # steady-state rebuild cost: SEEDED re-traversal (the first
                # traversal at a fresh radius re-runs itself O(log) times
                # while doubling its output caps — production rebuilds carry
                # counts across windows and run single-pass) + list prep +
                # uploads
                jax.block_until_ready(fs.m2l_h2)
                t0 = _time.perf_counter()
                m2l2, p2p2 = eng._traverse(c_h, lb_h, rb_h)
                fs2 = eng._lists_to_state(perm, inv, c_h, lam_h,
                                          m2l2, p2p2, {})
                jax.block_until_ready(fs2.m2l_h2)
                row["rebuild_s"] = round(_time.perf_counter() - t0, 4)
                row["first_traverse_s"] = round(t_trav, 4)
                del fs2, m2l2, p2p2
            print("@@ " + json.dumps(row), flush=True)
            del fs
            gc.collect()
            if err >= ERR_BOUND:
                break  # boost descent only loosens further
        if first_err >= ERR_BOUND:
            # monotone in r; allow one extra probe near the bound in case
            # of f32 noise, then stop the descent
            over_bound += 1
            if first_err >= 2 * ERR_BOUND or over_bound >= 2:
                break


# --------------------------------------------------------------------------
# child phase 2: headline timing for the winning config
# --------------------------------------------------------------------------

def final_timing(p, r, err, n=1_000_000, early_stop_s=0.0, boost=None):
    """Production timing (padded scan, async rebuilds amortized over
    tree_steps).  If early_stop_s > 0 and after >= 2 windows even the BEST
    window is slower than it, this candidate cannot win — stop."""
    if boost is not None:
        os.environ["CO_SUB_BOOST"] = str(boost)
    import numpy as np
    import jax

    from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.simulate import Simulator

    # tree_pipeline=2: adopt each rebuild two window boundaries after its
    # snapshot — the background rebuild (position fetch + host kd +
    # traversal) gets a 2-window wall budget, so tunnel-transport variance
    # cannot stall the device at boundaries (measured 2-4 s stalls per
    # boundary at depth 1 on slow-transport sessions).  Max staleness
    # tree_steps*3 = 24 steps; window-end error stays under the bound
    # (scripts/tree_steps_probe.py).
    # tree_resort_every stays 1: refresh-only boundaries keep the leaf
    # PARTITION stale, and at 32-particle sub-leaves the AABB overlap from
    # even 2-3 windows of drift swells the pair lists 40%+ (measured at
    # N=1M; ~4x after 6 windows), permanently bloating the monotone caps —
    # worse than the transport the refresh saves.
    config = SimConfig().replace(fmm_order=p, tree_radius=r,
                                 tree_pipeline=2)
    # surface recompiles in the timing log: a cap growth reshapes the scan
    # and a compile landing inside a timed window is the #1 source of
    # outlier windows — make it visible instead of guessing.  Silence the
    # per-trace dispatch spam (27 MB/run); keep pxla's "Compiling jit(...)"
    import logging
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.dispatch").setLevel(logging.ERROR)
    state = _init_state(n)
    sim = Simulator(config, n, engine="fmm3_kd")
    state = sim.init_acc(state)
    # warm-ups: compile both input layouts, then CROSS at least two rebuild
    # boundaries so (a) the pair-list caps absorb the staleness swell —
    # cap growth reshapes the scan and costs a full recompile (measured:
    # a 513-SECOND timed window when the first rebuild landed inside it)
    # — and (b) the async rebuild pipeline is primed (the first boundary
    # does a synchronous refresh)
    state = sim.run(state, 2)
    state = sim.run(state, 2)
    # cross SIX rebuild boundaries before timing: the beam's pair counts
    # drift a few % per window, and each pair-cap overflow recompiles the
    # scan (minutes remote) — settle the (now geometrically-grown) caps
    # here so no recompile lands inside a timed window
    for _ in range(3):
        sim.advance_padded(2 * max(config.tree_steps, 1))
        jax.block_until_ready(sim._padded.pos)
    steps, repeats = 16, 7
    times = []
    for w in range(repeats):
        t0 = time.perf_counter()
        handle = sim.advance_padded(steps)
        np.asarray(handle[0, 0])   # chained sync (transport-stall safe)
        times.append((time.perf_counter() - t0) / steps)
        bt = {k: round(v, 3)
              for k, v in getattr(sim._fmm, "last_build_times", {}).items()}
        print(f"window {w}: {times[-1]:.4f} s/step  caps={sim._fmm.caps}  "
              f"rebuild_wait={getattr(sim, 'last_rebuild_wait', -1):.3f}  "
              f"counts={getattr(sim._fmm, 'last_counts', {})}  bt={bt}",
              flush=True)
        if early_stop_s > 0 and len(times) >= 2 and min(times) > early_stop_s:
            break
    print("@@ " + json.dumps({"times": times}), flush=True)


# --------------------------------------------------------------------------
# parent: orchestrate one subprocess per phase (fresh HBM arena each)
# --------------------------------------------------------------------------

def _run_child(args):
    """Run a child phase, stream its output, return parsed @@ rows."""
    proc = subprocess.Popen([sys.executable, os.path.join(REPO, "bench.py")]
                            + [str(a) for a in args],
                            cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    rows = []
    for line in proc.stdout:
        line = line.rstrip("\n")
        if line.startswith("@@ "):
            rows.append(json.loads(line[3:]))
            print("# " + line[3:], flush=True)
        elif line:
            print("## " + line, flush=True)
    proc.wait()
    return rows, proc.returncode


def main():
    from coulomb_oscillators_tpu import SimConfig  # no device client needed
    cfg = SimConfig()
    tried = []
    for p in SEARCH_P:
        r_skip = 0
        while r_skip < len(SEARCH_R):
            rows, rc = _run_child(["gridp", p, r_skip])
            if rc not in (0, 17):
                print(f"## gridp {p} exited {rc}", flush=True)
            tried.extend(rows)
            if rc != 17:
                break
            # OOM: this child's arena is wedged; resume one radius down
            r_skip += max(len(rows), 1)

    # production score = frozen-tree force + amortized rebuild
    def score(row):
        return row["force_s"] + row.get("rebuild_s", 0.0) / max(
            cfg.tree_steps, 1)

    passing = sorted((row for row in tried if "force_s" in row), key=score)
    if not passing:
        print(json.dumps({"metric": "error", "value": -1,
                          "unit": "autotune_failed", "vs_baseline": None}))
        return

    # final production timing for the top 3 scored candidates — the scored
    # proxy still mispredicts scan-mode behavior (async overlap, caps), so
    # the headline config is decided by the real median
    finals = []
    best = None
    for cand in passing[:3]:
        early = 1.5 * best["median"] if best else 0.0
        rows, rc = _run_child(["final", cand["p"], cand["r"], cand["err"],
                               early, cand.get("boost", 1.5)])
        times = rows[-1]["times"] if rows else []
        if not times:
            print(f"## final {cand['p']} {cand['r']} failed rc={rc}",
                  flush=True)
            continue
        med = statistics.median(times)
        entry = {"p": cand["p"], "r": cand["r"], "err": cand["err"],
                 "boost": cand.get("boost", 1.5),
                 "median": med, "times": [round(t, 4) for t in times],
                 "score_proxy": round(score(cand), 4)}
        finals.append(entry)
        if best is None or med < best["median"]:
            best = entry
    if best is None:
        print(json.dumps({"metric": "error", "value": -1,
                          "unit": "final_timing_failed",
                          "vs_baseline": None}))
        return
    med = best["median"]
    n = 1_000_000
    out = {
        "metric": "particle_steps_per_s",
        "value": round(n / med, 0),
        "unit": "psteps/s",
        "vs_baseline": None,   # reference publishes no numbers (BASELINE.md)
        "extra": {
            "n": n, "p": best["p"], "r": best["r"],
            "sub_boost": best.get("boost", 1.5),
            "force_rel_err": round(best["err"], 6),
            "err_bound": ERR_BOUND,
            "sec_per_step_median": round(med, 4),
            "sec_per_step_all": best["times"],
            "tree_steps": cfg.tree_steps, "integrator": cfg.integrator,
            "final_candidates": finals,
            "autotune_grid": tried,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gridp":
        grid_for_p(int(sys.argv[2]),
                   r_skip=int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    elif len(sys.argv) > 1 and sys.argv[1] == "final":
        final_timing(int(sys.argv[2]), float(sys.argv[3]),
                     float(sys.argv[4]),
                     early_stop_s=float(sys.argv[5])
                     if len(sys.argv) > 5 else 0.0,
                     boost=float(sys.argv[6]) if len(sys.argv) > 6 else None)
    else:
        main()
