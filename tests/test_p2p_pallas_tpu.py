"""Hardware-gated test of the Pallas near-field kernel.

The CI suite runs on the virtual CPU mesh (conftest), where Pallas TPU
kernels cannot execute (interpret mode is unusably slow here, see the
verify skill) — so this test self-skips off-TPU.  On hardware it is run by
scripts/p2p_bench.py (which hard-asserts agreement with the jnp scan) and
can be invoked directly:

    JAX_PLATFORMS=axon _CO_ALLOW_TPU_TESTS=1 python -m pytest \
        tests/test_p2p_pallas_tpu.py -q -p no:cacheprovider
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu" and not os.environ.get(
        "_CO_ALLOW_TPU_TESTS"),
    reason="Pallas TPU kernel needs real hardware")


def test_pallas_p2p_matches_scan():
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU backend")
    from coulomb_oscillators_tpu import SimConfig
    from coulomb_oscillators_tpu.models import init_dist as ID
    from coulomb_oscillators_tpu.ops.fmm import KdFmmEngine

    n = 50_000
    cfg = SimConfig(fmm_order=3, tree_radius=1.7)
    x = (0.003, 0.001, 0.01)
    u = tuple(w * xs for w, xs in zip(cfg.omega0, x))
    pos_h, _ = ID.init_gaussian(n, x, u, dtype=np.float32)
    pos = jnp.asarray(pos_h)

    ref_eng = KdFmmEngine(cfg, n)
    ref = ref_eng.force(pos, ref_eng.build(pos))
    pal_eng = KdFmmEngine(cfg, n, use_pallas=True)
    fs = pal_eng.build(pos)
    got = pal_eng.force(pos, fs)
    scale = float(jnp.max(jnp.linalg.norm(ref, axis=1)))
    dev = float(jnp.max(jnp.linalg.norm(got - ref, axis=1))) / scale
    assert dev < 1e-5, dev

    # HBM-streaming variant must agree exactly with the resident kernel
    # (fresh jit: the padded-force trace caches the kernel choice)
    pal_eng.p2p_streaming = True
    pal_eng._padded_force_jit = jax.jit(pal_eng.force_padded_in_jit)
    got_s = pal_eng.force(pos, fs)
    dev_s = float(jnp.max(jnp.linalg.norm(got_s - got, axis=1))) / scale
    assert dev_s < 1e-6, dev_s
