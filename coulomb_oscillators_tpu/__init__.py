"""coulomb_oscillators_tpu — TPU-native N-body Coulomb-oscillator framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA simulator ``locuoco/coulomb_oscillators`` (see SURVEY.md): charged
particles in an external harmonic trap, with direct O(N^2) and Fast Multipole
Method force engines, symplectic integrators, deterministic initial
distributions, an accuracy/timing harness, and byte-compatible binary state
snapshots.

Design stance (TPU-first, not a CUDA translation):
  * state is a pytree of ``f32[N, DIM]`` arrays,
  * force engines are pure functions ``pos -> acc`` (jit/vmap/shard_map-able),
  * integrators are coefficient-table compositions fused under one jit,
  * the FMM is a fixed-shape, padded, batched pipeline whose inner products
    ride the MXU.
"""

from coulomb_oscillators_tpu.config import SimConfig
from coulomb_oscillators_tpu.state import ParticleState

__version__ = "0.1.0"

__all__ = ["SimConfig", "ParticleState", "__version__"]
