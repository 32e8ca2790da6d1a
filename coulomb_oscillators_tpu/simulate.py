"""Simulation driver: integrator x force-engine orchestration.

Mirrors the reference sim loop (main3.cu:832-874) with the kd-tree temporal
amortization (tree rebuilt every `tree_steps` iterations,
fmm_cart3_kdtree.cuh:1619-1642): between rebuilds the integrator runs as one
jitted lax.scan with the frozen FmmState as a captured input; the rebuild
(device sort + host traversal) happens at the jit boundary.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from coulomb_oscillators_tpu.config import SimConfig
from coulomb_oscillators_tpu.models import integrators as I
from coulomb_oscillators_tpu.ops.elastic import add_elastic
from coulomb_oscillators_tpu.state import ParticleState


class Simulator:
    """Runs the Coulomb-oscillator system with any force engine."""

    def __init__(self, config: SimConfig, n: int, engine: str = "direct"):
        self.config = config
        self.n = n
        self.engine_name = engine
        self.omega0_sq = config.omega0_sq()
        self._fmm = None
        self._fstate = None
        self._steps_since_build = 0

        if engine.startswith("fmm") or engine == "appel":
            from coulomb_oscillators_tpu.ops import fmm as fmm_mod
            self._fmm = fmm_mod.make_engine_object(config, n, engine)
            self._scan_step = self._make_fmm_scan()
        else:
            from coulomb_oscillators_tpu.models.oscillator import (
                make_oscillator_force)
            force = make_oscillator_force(config, n, engine)
            step = I.make_step(force, config.integrator, config.dt)
            self._plain_step = jax.jit(step)

            @jax.jit
            def scan_k(state, k):
                return jax.lax.fori_loop(0, k, lambda _, s: step(s), state)

            self._plain_scan = lambda state, k: scan_k(state, jnp.int32(k))

    # ------------------------------------------------------------------ #
    def _make_fmm_scan(self):
        eng = self._fmm
        cfg = self.config
        omega0_sq = self.omega0_sq

        def force(pos, fstate):
            acc = eng.force_in_jit(pos, fstate)
            return add_elastic(pos, acc, omega0_sq)

        @jax.jit
        def scan_k(state, fstate, k):
            # k is traced: ONE compile covers every inter-rebuild stride
            step = I.make_step(lambda p: force(p, fstate),
                               cfg.integrator, cfg.dt)
            return jax.lax.fori_loop(0, k, lambda _, s: step(s), state)

        return lambda state, fstate, k: scan_k(state, fstate, jnp.int32(k))

    # ------------------------------------------------------------------ #
    def init_acc(self, state: ParticleState) -> ParticleState:
        """Precompute a0 (main3.cu:835-839)."""
        if self._fmm is not None:
            self._fstate = self._fmm.build(state.pos)
            self._steps_since_build = 0
            acc = self._fmm.force(state.pos, self._fstate)
            acc = add_elastic(state.pos, acc, self.omega0_sq)
        else:
            from coulomb_oscillators_tpu.models.oscillator import (
                make_oscillator_force)
            acc = make_oscillator_force(self.config, self.n,
                                        self.engine_name)(state.pos)
        return state._replace(acc=acc)

    def run(self, state: ParticleState, steps: int) -> ParticleState:
        """Advance `steps` iterations, rebuilding the tree as configured."""
        if self._fmm is None:
            return self._plain_scan(state, steps)

        ts = max(self.config.tree_steps, 1)
        done = 0
        while done < steps:
            if self._fstate is None or self._steps_since_build >= ts:
                self._fstate = self._fmm.build(state.pos)
                self._steps_since_build = 0
            k = min(ts - self._steps_since_build, steps - done)
            state = self._scan_step(state, self._fstate, k)
            self._steps_since_build += k
            done += k
        return state
