"""EDM Euler scheduler (Karras sigmas) — the Cosmos Text2World sampler.

Reference: diffusers EDMEulerScheduler as used by CosmosTextToWorldPipeline
(/root/reference/cosmos_t2v_inference.py:79-86 reads pipe.scheduler
timesteps). EDM preconditioning (Karras et al. 2022, eq. 7):
  c_skip = sd^2 / (sigma^2 + sd^2)
  c_out  = sigma * sd / sqrt(sigma^2 + sd^2)
  c_in   = 1 / sqrt(sigma^2 + sd^2)
  c_noise = log(sigma) / 4          (the "timestep" fed to the model)
Euler step: d = (x - denoised) / sigma; x <- x + (sigma_next - sigma) * d.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class EDMEuler:
    num_steps: int
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    rho: float = 7.0

    def __post_init__(self):
        n = self.num_steps
        ramp = np.linspace(0.0, 1.0, n, dtype=np.float64)
        min_r = self.sigma_min ** (1.0 / self.rho)
        max_r = self.sigma_max ** (1.0 / self.rho)
        sig = (max_r + ramp * (min_r - max_r)) ** self.rho
        self.sigmas = np.concatenate([sig, [0.0]])
        self.timesteps = (0.25 * np.log(sig)).astype(np.float32)  # c_noise

    @property
    def init_noise_sigma(self) -> float:
        return float(self.sigmas[0])

    def precondition_inputs(self, i: int, x):
        sigma = float(self.sigmas[i])
        c_in = 1.0 / (sigma**2 + self.sigma_data**2) ** 0.5
        return x * c_in

    def precondition_outputs(self, i: int, x, model_out):
        sigma = float(self.sigmas[i])
        sd = self.sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / (sigma**2 + sd**2) ** 0.5
        return c_skip * x + c_out * model_out.astype(x.dtype)

    def init_state(self):
        return ()

    def step(self, i: int, x, model_out, state=()):
        """x: current (noisy) sample; model_out: raw network output."""
        sigma = float(self.sigmas[i])
        denoised = self.precondition_outputs(i, x, model_out)
        d = (x - denoised) / sigma
        x = x + (float(self.sigmas[i + 1]) - sigma) * d
        return x, state
