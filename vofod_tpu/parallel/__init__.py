"""Multi-chip scaling via jax.sharding (SPMD over a device mesh)."""
