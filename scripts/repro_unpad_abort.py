"""Minimal repro for the round-3 TPU worker fault (Mosaic/XLA scheduling).

Fault family: compiling the unpad gathers (padded [G, C, dim] -> original
order, two N-row gathers) into the SAME XLA program as the Pallas near-field
kernel crashes the TPU worker (`jax.errors.JaxRuntimeError: ABORTED: TPU
backend error`) at some shapes — first seen at N=1M, L=15, C_blk=128 during
the round-3 bench grid.  The padded pipeline alone runs clean, and the
pad-side fusion runs clean; only the Pallas-output -> unpad-gather fusion
faults.

Production workarounds (both in ops/fmm/kdtree.py):
  * force() dispatches pad / padded-pipeline / unpad as THREE XLA programs
    (kdtree.py `__init__`, `_force_jit`),
  * unpad_array() opens with `jax.lax.optimization_barrier` so even a caller
    that fuses force into a larger jit keeps the Pallas output's default
    layout/schedule at the boundary (kdtree.py `unpad_array`),
  * bench.py children never fetch device arrays mid-phase (the round-3 crash
    fired inside a `np.asarray(state.pos)` right after Pallas programs).

Usage (run on the TPU; small-n CPU runs exercise the code path only):

    python scripts/repro_unpad_abort.py safe   [n]   # production dispatch
    python scripts/repro_unpad_abort.py fault  [n]   # fused, no barrier
    python scripts/repro_unpad_abort.py fetch  [n]   # fused + host fetch

`safe` must always exit 0.  `fault`/`fetch` reproduce the crash when the
toolchain still carries the bug (the process dies with ABORTED -> nonzero
exit); if they exit 0 the installed jax/libtpu no longer needs the
workarounds and the three-program split can be retired.
"""

import sys

sys.path.insert(0, ".")

from coulomb_oscillators_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "safe"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine

    cfg = SimConfig(fmm_order=6, tree_radius=1.67)
    x0 = (0.003, 0.001, 0.01)
    u0 = tuple(w * xs for w, xs in zip(cfg.omega0, x0))
    pos_h, _ = ID.init_gaussian(n, x0, u0)
    pos = jnp.asarray(pos_h)

    eng = KdFmmEngine(cfg, n)
    fs = eng.build(pos)
    print(f"n={n} L={eng.L} C={eng.st.C} C_blk={eng.C_blk} "
          f"pallas={eng.use_pallas} backend={jax.default_backend()}",
          flush=True)

    if mode == "safe":
        acc = eng.force(pos, fs)             # three-program dispatch
        print("safe checksum", float(jnp.sum(acc * acc)), flush=True)
        return

    # ONE fused program: pad + Pallas near field + far field + unpad
    # gathers, with NO optimization_barrier — the faulting schedule.
    st = eng.st

    @jax.jit
    def fused(x, f):
        ppad = eng.pad_array(x, f, fill=1e18)
        acc_pad = eng.force_padded_in_jit(ppad, f)
        xs = jnp.take(acc_pad.reshape(-1, acc_pad.shape[-1]),
                      jnp.asarray(st.unpad_gather), axis=0)
        return jnp.take(xs, f.inv_perm, axis=0)

    acc = fused(pos, fs)
    if mode == "fetch":
        # the round-3 bench crash site: a host fetch racing the worker
        # right after Pallas dispatches
        h = np.asarray(acc)
        print("fetch checksum", float((h * h).sum()), flush=True)
    else:
        print("fused checksum", float(jnp.sum(acc * acc)), flush=True)


if __name__ == "__main__":
    main()
