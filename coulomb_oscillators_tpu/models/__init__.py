"""System models: the Coulomb-oscillator system, integrators, initial distributions."""
