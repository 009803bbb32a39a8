"""Flow-match samplers: exactness on linear flows + cross-check vs a direct
numpy port of the reference loop (fm_solvers_unipc.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparse_videogen_tpu.schedulers import FlowMatchEuler, FlowUniPC


def np_flow_unipc_reference(v_fn, x, sigmas, orders):
    """Direct numpy port of the reference step loop (predict_x0, bh2)."""
    N = len(sigmas) - 1
    model_outputs = [None, None]
    last_sample = None
    this_order = None
    lam = lambda i: np.log(1 - sigmas[i]) - np.log(sigmas[i]) if sigmas[i] > 0 else np.inf

    for i in range(N):
        v = v_fn(x, sigmas[i])
        x0 = x - sigmas[i] * v
        use_corrector = i > 0 and last_sample is not None
        if use_corrector:
            # multistep_uni_c_bh_update at step i with order=this_order
            m0 = model_outputs[-1]
            h = lam(i) - lam(i - 1)
            a_t, s_t = 1 - sigmas[i], sigmas[i]
            hh = -h
            h_phi_1 = np.expm1(hh)
            B_h = np.expm1(hh)
            if this_order == 1:
                rhos_c = np.array([0.5])
                D1s = None
            else:
                rk = (lam(i - 2) - lam(i - 1)) / h
                rks = np.array([rk, 1.0])
                R, b = [], []
                fact = 1
                h_phi_k = h_phi_1 / hh - 1
                for o in range(1, this_order + 1):
                    R.append(rks ** (o - 1))
                    b.append(h_phi_k * fact / B_h)
                    fact *= o + 1
                    h_phi_k = h_phi_k / hh - 1 / fact
                rhos_c = np.linalg.solve(np.stack(R), np.array(b))
                D1s = (model_outputs[-2] - m0) / rk
            D1_t = x0 - m0
            x_t = s_t / sigmas[i - 1] * last_sample - a_t * h_phi_1 * m0
            corr = rhos_c[-1] * D1_t
            if D1s is not None:
                corr = corr + rhos_c[0] * D1s
            x = x_t - a_t * B_h * corr

        model_outputs = [model_outputs[-1], x0]
        this_order = orders[i]
        last_sample = x

        # predictor
        a_t, s_t = 1 - sigmas[i + 1], sigmas[i + 1]
        h = lam(i + 1) - lam(i)
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)
        x_t = s_t / sigmas[i] * x - a_t * h_phi_1 * x0
        if this_order == 2:
            rk = (lam(i - 1) - lam(i)) / h
            D1s = (model_outputs[-2] - x0) / rk
            x_t = x_t - a_t * B_h * 0.5 * D1s
        x = x_t
    return x


@pytest.mark.parametrize("steps,shift", [(4, 5.0), (10, 3.0)])
def test_unipc_exact_on_constant_velocity(steps, shift):
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 3, 4)).astype(np.float32)
    eps = rng.standard_normal((2, 3, 4)).astype(np.float32)
    sch = FlowUniPC(steps, shift=shift)
    s0 = sch.sigmas[0]
    x = jnp.asarray((1 - s0) * x0 + s0 * eps)
    state = sch.init_state(x)
    v = jnp.asarray(eps - x0)
    for i in range(steps):
        x, state = sch.step(i, x, v, state)
    np.testing.assert_allclose(np.asarray(x), x0, rtol=2e-4, atol=2e-5)


def test_euler_exact_on_constant_velocity():
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4,)).astype(np.float32)
    eps = rng.standard_normal((4,)).astype(np.float32)
    sch = FlowMatchEuler(6, shift=7.0)
    s0 = sch.sigmas[0]
    x = jnp.asarray((1 - s0) * x0 + s0 * eps)
    for i in range(6):
        x, _ = sch.step(i, x, jnp.asarray(eps - x0))
    np.testing.assert_allclose(np.asarray(x), x0, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("steps", [3, 8])
def test_unipc_matches_reference_port(steps):
    rng = np.random.default_rng(2)
    x_init = rng.standard_normal((5,)).astype(np.float64)

    def v_fn(x, sigma):
        return np.tanh(x) * 0.3 + 0.7 * sigma

    sch = FlowUniPC(steps, shift=5.0)
    ref = np_flow_unipc_reference(v_fn, x_init.copy(), sch.sigmas, sch.pred_order)

    x = jnp.asarray(x_init, jnp.float32)
    state = sch.init_state(x)
    for i in range(steps):
        v = jnp.asarray(v_fn(np.asarray(x, np.float64), sch.sigmas[i]), jnp.float32)
        x, state = sch.step(i, x, v, state)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-4, atol=2e-5)


def test_unipc_timesteps_match_reference_semantics():
    sch = FlowUniPC(50, shift=5.0)
    assert sch.timesteps[0] > 990 and sch.timesteps[-1] > 0
    assert np.all(np.diff(sch.timesteps) < 0)
    assert sch.sigmas[-1] == 0.0


# ---------------------------------------------------------------------------
# CogVideoX DDIM (v-prediction, zero-terminal-SNR)
# ---------------------------------------------------------------------------

def test_cog_ddim_zero_terminal_snr_and_trailing_spacing():
    from sparse_videogen_tpu.schedulers.ddim_cog import CogDDIM

    sch = CogDDIM(50)
    assert abs(sch.alphas_cumprod[-1]) < 1e-12  # zero terminal SNR
    assert sch.timesteps[0] == 999 and sch.timesteps[-1] == 19
    assert np.all(np.diff(sch.timesteps) == -20)


@pytest.mark.parametrize("snr_shift", [1.0, 3.0])
def test_cog_ddim_recovers_x0_given_true_v(snr_shift):
    """Feeding the exact v for a fixed (x0, eps) pair must keep the DDIM
    trajectory on x_t = sqrt(ac)*x0 + sqrt(1-ac)*eps and land on x0."""
    from sparse_videogen_tpu.schedulers.ddim_cog import CogDDIM

    sch = CogDDIM(10, snr_shift_scale=snr_shift)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 8)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 8)).astype(np.float32)
    # zero terminal SNR: x_T (t=999) is pure noise
    x = jnp.asarray(eps)
    st = sch.init_state()
    for i in range(10):
        t = int(sch.timesteps[i])
        ac = sch.alphas_cumprod[t]
        a, s = ac**0.5, (1 - ac) ** 0.5
        np.testing.assert_allclose(np.asarray(x), a * x0 + s * eps, atol=1e-5)
        v = jnp.asarray(a * eps - s * x0, jnp.float32)
        x, st = sch.step(i, x, v, st)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-5)


# ---------------------------------------------------------------------------
# Flow DPM-Solver++ (fm_solvers.py re-derivation)
# ---------------------------------------------------------------------------

def np_flow_dpm_reference(v_fn, x, sigmas, order=2):
    """Direct numpy port of the reference step loop
    (fm_solvers.py: convert_model_output + first/second order updates,
    midpoint, final_sigmas_type=zero)."""
    N = len(sigmas) - 1
    lam = lambda i: (np.log(1 - sigmas[i]) - np.log(sigmas[i])
                     if sigmas[i] > 0 else np.inf)
    m_prev = None
    lower_order_nums = 0
    for i in range(N):
        v = v_fn(x, sigmas[i])
        m0 = x - sigmas[i] * v
        lof = (i == N - 1)  # final_sigmas_type == "zero" forces order 1
        use_first = order == 1 or lower_order_nums < 1 or lof
        s_t, s_s = sigmas[i + 1], sigmas[i]
        a_t = 1 - s_t
        h = lam(i + 1) - lam(i)
        em1 = np.expm1(-h) if np.isfinite(h) else -1.0
        if use_first:
            x = (s_t / s_s) * x - a_t * em1 * m0
        else:
            h0 = lam(i) - lam(i - 1)
            r0 = h0 / h
            D1 = (m0 - m_prev) / r0
            x = (s_t / s_s) * x - a_t * em1 * (m0 + 0.5 * D1)
        m_prev = m0
        lower_order_nums = min(lower_order_nums + 1, order)
    return x


def test_flow_dpm_exact_on_constant_velocity():
    """For a constant velocity field the flow is linear and DPM++ (any
    order) must follow it exactly: x_i = x0 + sigma_i * v."""
    from sparse_videogen_tpu.schedulers.fm_dpm import FlowDPM

    sch = FlowDPM(10, shift=3.0)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 3)).astype(np.float64)
    v = rng.standard_normal((2, 3)).astype(np.float64)
    x = jnp.asarray(x0 + sch.sigmas[0] * v)
    st = sch.init_state(x)
    for i in range(10):
        x, st = sch.step(i, x, jnp.asarray(v), st)
        np.testing.assert_allclose(np.asarray(x), x0 + sch.sigmas[i + 1] * v, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x), x0, atol=1e-6)


@pytest.mark.parametrize("steps", [4, 12, 50])
def test_flow_dpm_matches_reference_port(steps):
    from sparse_videogen_tpu.schedulers.fm_dpm import FlowDPM

    sch = FlowDPM(steps, shift=5.0)
    rng = np.random.default_rng(1)
    W = rng.standard_normal((4, 4)) * 0.3

    def v_fn(x, s):
        return np.tanh(x @ W) + 0.1 * s * x

    x0 = rng.standard_normal((2, 4))
    ref = np_flow_dpm_reference(lambda x, s: v_fn(x, s), x0.copy(), sch.sigmas)

    x = jnp.asarray(x0)
    st = sch.init_state(x)
    for i in range(steps):
        v = jnp.asarray(v_fn(np.asarray(x), sch.sigmas[i]))
        x, st = sch.step(i, x, v, st)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-5, atol=1e-7)
