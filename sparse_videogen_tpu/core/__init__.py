"""Pure-jnp reference algorithms (CPU-runnable test oracles).

Everything in this subpackage is plain JAX — no Pallas, no device-specific
code. These functions define the semantics; `sparse_videogen_tpu.ops` holds
the fast TPU kernels that must match them.
"""
