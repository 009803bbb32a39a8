"""Pallas TPU kernels (with jnp fallbacks / interpret-mode CPU execution).

The centerpiece is ONE universal block-sparse flash-attention kernel
(ops/attention.py) driven by per-(head, q-block-row) CSR metadata
(ops/metadata.py). Dense attention, SVG1's static band+sink mask, and
SVG2's per-head dynamic cluster map are all just different metadata — the
kernel never recompiles when per-head decisions change.
"""
