"""Multi-chip sharding: particle-sharded force evaluation over a jax Mesh."""
