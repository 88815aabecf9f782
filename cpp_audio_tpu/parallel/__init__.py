"""Multi-chip scaling: voice/frame sharding over a jax.sharding.Mesh."""
