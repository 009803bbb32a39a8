"""Functional DiT model families (param-pytree style, no module framework).

Each model exposes:
  - a frozen Config dataclass (static, hashable)
  - init_params(rng, cfg) -> pytree        (random init, for tests/bench)
  - forward(params, cfg, ...) -> output    (pure, jit-able)
  - attention is injected via sparse/runtimes.py so dense / SVG1 / SAP are
    first-class configuration instead of the reference's monkey-patching
    (SURVEY.md section 1 "key architectural fact").
"""
