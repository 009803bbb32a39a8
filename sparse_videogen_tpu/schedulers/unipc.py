"""UniPC multistep sampler for flow matching (predict-x0, bh2, order 2).

Faithful re-derivation of FlowUniPCMultistepScheduler
(/root/reference/svg/models/wan_orig/utils/fm_solvers_unipc.py:78-720; the
diffusers UniPCMultistepScheduler with flow sigmas used by
wan_t2v_inference.py:73-77 computes the same updates):

  sigmas: linspace(sigma_max..sigma_min, N) shifted by
          s' = shift*s / (1 + (shift-1)*s), final sigma 0
  x0-pred: x0 = x - sigma_i * v               (convert_model_output :309)
  corrector UniC-bh2 (:455-594) applied to the *current* sample using the
  previous step's history, then predictor UniP-bh2 (:323-453).

TPU design: every scalar coefficient depends only on (sigmas, step index) so
the full coefficient table is computed host-side in f64 numpy at setup; the
device-side step is a handful of fused linear combinations. Order warm-up
(`lower_order_nums`) and `lower_order_final` are folded into the table by
zeroing the history weights, so the jitted step function is structurally
identical for every step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _phi_coeffs(h: float, order: int):
    """rho coefficients of UniPC-bh2 in predict-x0 mode for uniform use.

    Returns (B_h, h_phi_1, rhos) for the given order following
    fm_solvers_unipc.py:398-445 with rks handled by the caller.
    """
    hh = -h
    h_phi_1 = np.expm1(hh)
    B_h = np.expm1(hh)
    return B_h, h_phi_1


@dataclasses.dataclass
class FlowUniPC:
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
        # NOTE: set_timesteps (:166-186) re-applies the shift to
        # linspace(sigma_max, sigma_min) whose endpoints are already shifted
        # by __init__ — the double shift is reproduced deliberately.
        s_raw = np.linspace(sigma_max, sigma_min, self.num_steps + 1, dtype=np.float64)[:-1]
        s2 = self.shift * s_raw / (1 + (self.shift - 1) * s_raw)
        self.sigmas = np.concatenate([s2, [0.0]])
        self.timesteps = (s2 * n_train).astype(np.float64)

        N = self.num_steps
        sig = self.sigmas

        def lam(i):
            a, s_ = 1 - sig[i], sig[i]
            with np.errstate(divide="ignore"):
                return np.log(a) - np.log(s_)  # lambda(sigma=0) = +inf (final step)

        # per-step effective orders (step :672-681): this_order at step i
        orders = []
        lower_order_nums = 0
        for i in range(N):
            this = min(self.solver_order, N - i) if self.lower_order_final else self.solver_order
            this = min(this, lower_order_nums + 1)
            orders.append(this)
            if lower_order_nums < self.solver_order:
                lower_order_nums += 1
        self.pred_order = orders

        # predictor coefficients at step i (update from sigma_i -> sigma_{i+1})
        pc = {"a": [], "b": [], "c": [], "rk": []}
        for i in range(N):
            a_t, s_t = 1 - sig[i + 1], sig[i + 1]
            h = lam(i + 1) - lam(i)
            B_h, h_phi_1 = _phi_coeffs(h, orders[i])
            pc["a"].append(s_t / sig[i])
            pc["b"].append(a_t * h_phi_1)
            if orders[i] == 2:
                rk = (lam(i - 1) - lam(i)) / h
                pc["c"].append(a_t * B_h * 0.5)  # rhos_p = [0.5] (:437)
                pc["rk"].append(rk)
            else:
                pc["c"].append(0.0)
                pc["rk"].append(1.0)
        self.pred_coeffs = {k: np.array(v) for k, v in pc.items()}

        # corrector coefficients applied at step i (from sigma_{i-1} -> sigma_i),
        # with order = this_order chosen at step i-1... the reference applies
        # the corrector with self.this_order set by the *previous* step call
        # (step :659 uses self.this_order computed in the previous invocation).
        cc = {"use": [], "a": [], "b": [], "c_hist": [], "c_t": [], "rk": []}
        for i in range(N):
            if i == 0:
                for k in cc:
                    cc[k].append(0.0)
                continue
            order_c = orders[i - 1]
            a_t, s_t = 1 - sig[i], sig[i]
            h = lam(i) - lam(i - 1)
            B_h, h_phi_1 = _phi_coeffs(h, order_c)
            cc["use"].append(1.0)
            cc["a"].append(s_t / sig[i - 1])
            cc["b"].append(a_t * h_phi_1)
            if order_c == 1:
                cc["c_hist"].append(0.0)
                cc["c_t"].append(a_t * B_h * 0.5)  # rhos_c = [0.5] (:573)
                cc["rk"].append(1.0)
            else:
                rk = (lam(i - 2) - lam(i - 1)) / h
                rks = np.array([rk, 1.0])
                hh = -h
                h_phi_k = h_phi_1 / hh - 1
                R, b = [], []
                fact = 1
                for o in range(1, order_c + 1):
                    R.append(rks ** (o - 1))
                    b.append(h_phi_k * fact / B_h)
                    fact *= o + 1
                    h_phi_k = h_phi_k / hh - 1 / fact
                rhos = np.linalg.solve(np.stack(R), np.array(b))
                cc["c_hist"].append(a_t * B_h * rhos[0])
                cc["c_t"].append(a_t * B_h * rhos[1])
                cc["rk"].append(rk)
        self.corr_coeffs = {k: np.array(v) for k, v in cc.items()}

    # -- functional state -------------------------------------------------
    def init_state(self, x):
        z = jnp.zeros_like(x, dtype=jnp.float32)
        return dict(m_last=z, m_prev=z, x_last=z)

    def step(self, i: int, x, v, state):
        """One predictor(-corrector) step. x: current sample; v: model output
        (flow velocity) at (x, t_i). Returns (x_next, new_state).

        i is a python int (host loop); all coefficients are baked scalars for
        step i — jit the *pipeline* step with i static or pass coefficients
        as arrays and index with a traced i (see step_traced).
        """
        pc = {k: jnp.float32(a[i]) for k, a in self.pred_coeffs.items()}
        cc = {k: jnp.float32(a[i]) for k, a in self.corr_coeffs.items()}
        # structural flags are static (4 distinct compiles across all steps)
        return _unipc_update(
            x, v, state, jnp.float32(self.sigmas[i]), pc, cc,
            order=int(self.pred_order[i]),
            use_corrector=bool(self.corr_coeffs["use"][i] > 0),
            has_hist=bool(self.corr_coeffs["c_hist"][i] != 0.0),
        )


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("order", "use_corrector", "has_hist"))
def _unipc_update(x, v, state, sigma_i, pc, cc, *, order, use_corrector, has_hist):
    xf = x.astype(jnp.float32)
    x0 = xf - sigma_i * v.astype(jnp.float32)  # convert_model_output (:309)
    m0 = state["m_last"]

    if use_corrector:
        D1_t = x0 - m0
        corr = cc["c_t"] * D1_t
        if has_hist:
            D1s = (state["m_prev"] - m0) / cc["rk"]
            corr = corr + cc["c_hist"] * D1s
        xf = cc["a"] * state["x_last"] - cc["b"] * m0 - corr

    # history push
    new_state = dict(m_last=x0, m_prev=m0, x_last=xf)

    # predictor (uses the *new* m_last = x0)
    xp = pc["a"] * xf - pc["b"] * x0
    if order == 2:
        D1s = (m0 - x0) / pc["rk"]
        xp = xp - pc["c"] * D1s
    return xp.astype(x.dtype), new_state
