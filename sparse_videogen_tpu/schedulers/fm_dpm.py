"""DPM-Solver++ multistep sampler for flow matching (predict-x0, order 2).

Faithful re-derivation of FlowDPMSolverMultistepScheduler
(/root/reference/svg/models/wan_orig/utils/fm_solvers.py:1-789; diffusers
DPMSolverMultistepScheduler with flow sigmas, algorithm dpmsolver++):

  sigmas: the same shifted construction as FlowUniPC (fm_solvers.py
          set_timesteps mirrors fm_solvers_unipc.py)
  x0-pred: x0 = x - sigma_i * v            (convert_model_output)
  1st order: x_t = (s_t/s_s) x - a_t (e^{-h} - 1) x0
  2nd order (multistep, dpmsolver++):
      D1 = (m0 - m1) / r0,  r0 = h_prev / h
      x_t = (s_t/s_s) x - a_t (e^{-h} - 1) (m0 + 0.5 D1)
  with a = 1 - sigma, lambda = log(a) - log(sigma), h = lam_t - lam_s.

TPU design (like schedulers/unipc.py): every scalar coefficient is a pure
function of (sigmas, step index), precomputed host-side in f64; the device
step is x_next = c_x * x + c_m0 * x0 + c_m1 * x0_prev with order warm-up and
lower_order_final folded into the table.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class FlowDPM:
    num_steps: int
    shift: float = 5.0
    num_train_timesteps: int = 1000
    solver_order: int = 2
    lower_order_final: bool = True

    def __post_init__(self):
        assert self.solver_order == 2, "order-2 (the reference default) is implemented"
        n_train = self.num_train_timesteps
        alphas = np.linspace(1, 1 / n_train, n_train, dtype=np.float64)[::-1]
        base = 1.0 - alphas
        base = self.shift * base / (1 + (self.shift - 1) * base)
        sigma_max, sigma_min = base[0], base[-1]
        s_raw = np.linspace(sigma_max, sigma_min, self.num_steps + 1, dtype=np.float64)[:-1]
        s2 = self.shift * s_raw / (1 + (self.shift - 1) * s_raw)
        self.sigmas = np.concatenate([s2, [0.0]])
        self.timesteps = (s2 * n_train).astype(np.float64)

        N = self.num_steps
        sig = self.sigmas

        def lam(i):
            a, s_ = 1 - sig[i], sig[i]
            with np.errstate(divide="ignore"):
                return np.log(a) - np.log(s_)

        cx = np.zeros(N)
        cm0 = np.zeros(N)
        cm1 = np.zeros(N)
        lower_order_nums = 0
        for i in range(N):
            order = self.solver_order
            if self.lower_order_final and (N - i) < order:
                order = N - i
            order = min(order, lower_order_nums + 1)

            s_t, s_s = sig[i + 1], sig[i]
            a_t = 1.0 - s_t
            h = lam(i + 1) - lam(i)
            # sigma_final = 0 -> h = +inf: exp(-h) - 1 -> -1, s_t/s_s -> 0
            em1 = np.expm1(-h) if np.isfinite(h) else -1.0
            A = a_t * em1
            cx[i] = s_t / s_s
            if order == 1:
                cm0[i] = -A
            else:
                h0 = lam(i) - lam(i - 1)
                r0 = h0 / h if np.isfinite(h) else 0.0
                if np.isfinite(h):
                    cm0[i] = -A * (1.0 + 0.5 / r0)
                    cm1[i] = A * 0.5 / r0
                else:
                    # final step: D1 -> 0 influence comes only through A=-a_t;
                    # the reference computes with torch inf arithmetic where
                    # r0 = h0/inf = 0 -> 1/(2 r0) = inf * 0 ... it guards by
                    # taking the first-order form when h is infinite
                    cm0[i] = -A
            lower_order_nums = min(lower_order_nums + 1, self.solver_order)
        self._cx, self._cm0, self._cm1 = cx, cm0, cm1

    def init_state(self, x):
        import jax.numpy as jnp

        return jnp.zeros_like(x)  # previous x0 (unused at step 0: cm1[0]=0)

    def step(self, i: int, x, v, state):
        x0 = x - float(self.sigmas[i]) * v.astype(x.dtype)
        x_next = (
            float(self._cx[i]) * x
            + float(self._cm0[i]) * x0
            + float(self._cm1[i]) * state
        )
        return x_next, x0
