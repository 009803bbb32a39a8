"""Checkpoint loading: HF/reference weights -> jax param pytrees."""
