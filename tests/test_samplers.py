"""Sampler tests: precomputed-coefficient UniPC/DPM++ vs an independent
step-by-step oracle, plus exact-recovery integration properties."""

import math

import jax.numpy as jnp
import numpy as np

from univid_tpu.ops.samplers import (
    add_flow_noise,
    dpm_init_state,
    dpm_step,
    euler_flow_step,
    flow_sigmas,
    precompute_dpm_solver,
    precompute_unipc,
    unipc_init_state,
    unipc_step,
)


# ---------------------------------------------------------------------------
# Independent stateful UniPC oracle (predict_x0, bh2), written directly from
# the UniPC paper's B(h) formulation; numpy float64.
# ---------------------------------------------------------------------------


class UniPCOracle:
    def __init__(self, sigmas, order=2, lower_order_final=True):
        self.sig = np.asarray(sigmas, dtype=np.float64)
        self.order = order
        self.lower_order_final = lower_order_final
        self.outputs = []       # converted outputs m_j (x0 predictions)
        self.last_sample = None
        self.this_order = None
        self.lower = 0
        self.n = len(self.sig) - 1

    def lam(self, s):
        return math.inf if s <= 0 else math.log(1 - s) - math.log(s)

    def bh(self, h, p):
        hh = -h
        h_phi_1 = math.expm1(hh)
        b_h = math.expm1(hh)  # bh2
        b, fact, hpk = [], 1.0, h_phi_1 / hh - 1.0
        for i in range(1, p + 1):
            b.append(hpk * fact / b_h)
            fact *= i + 1
            hpk = hpk / hh - 1.0 / fact
        return h_phi_1, b_h, np.asarray(b)

    def corrector(self, i, m_new, x_pred):
        p = self.this_order
        s_t, s_s0 = self.sig[i], self.sig[i - 1]
        a_t = 1 - s_t
        h = self.lam(s_t) - self.lam(s_s0)
        m0 = self.outputs[-1]
        rks, d1s = [], []
        for k in range(1, p):
            rk = (self.lam(self.sig[i - 1 - k]) - self.lam(s_s0)) / h
            rks.append(rk)
            d1s.append((self.outputs[-(k + 1)] - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)
        h_phi_1, b_h, b = self.bh(h, p)
        if p == 1:
            rhos = np.asarray([0.5])
        else:
            R = np.stack([rks ** j for j in range(p)])
            rhos = np.linalg.solve(R, b)
        x_t_ = s_t / s_s0 * self.last_sample - a_t * h_phi_1 * m0
        corr = sum(rhos[k] * d1s[k] for k in range(p - 1))
        d1_t = m_new - m0
        return x_t_ - a_t * b_h * (corr + rhos[-1] * d1_t)

    def predictor(self, i, x):
        p = self.this_order
        s_t, s_s0 = self.sig[i + 1], self.sig[i]
        a_t = 1 - s_t
        h = self.lam(s_t) - self.lam(s_s0)
        m0 = self.outputs[-1]
        rks, d1s = [], []
        for k in range(1, p):
            rk = (self.lam(self.sig[i - k]) - self.lam(s_s0)) / h
            rks.append(rk)
            d1s.append((self.outputs[-(k + 1)] - m0) / rk)
        h_phi_1, b_h, _ = self.bh(h, p)
        if p >= 2:
            rhos = np.asarray([0.5]) if p == 2 else None
            assert p == 2, "oracle supports order <= 2"
            pred = rhos[0] * d1s[0]
        else:
            pred = 0.0
        x_ratio = (s_t / s_s0) if s_s0 > 0 else 0.0
        return x_ratio * x - a_t * h_phi_1 * m0 - a_t * b_h * pred

    def step(self, i, v, x):
        m = x - self.sig[i] * v
        if i > 0:
            x = self.corrector(i, m, x)
        self.outputs.append(m)
        if self.lower_order_final:
            this = min(self.order, self.n - i)
        else:
            this = self.order
        self.this_order = min(this, self.lower + 1)
        self.lower = min(self.lower + 1, self.order)
        self.last_sample = x
        return self.predictor(i, x)


def test_flow_sigmas_shift():
    sig, ts = flow_sigmas(50, shift=5.0)
    assert sig.shape == (51,) and ts.shape == (50,)
    assert sig[-1] == 0.0
    # shift transform of sigma_max = 0.999
    s = 0.999
    assert math.isclose(sig[0], 5 * s / (1 + 4 * s), rel_tol=1e-12)
    assert np.all(np.diff(sig) < 0)
    assert np.all(ts == np.floor(sig[:-1] * 1000))


def test_unipc_matches_oracle():
    steps = 10
    sig, _ = flow_sigmas(steps, shift=5.0)
    rng = np.random.default_rng(0)
    shape = (2, 3, 4)
    x0 = rng.standard_normal(shape)
    vs = [rng.standard_normal(shape) for _ in range(steps)]

    oracle = UniPCOracle(sig)
    x_ref = x0.copy()
    traj_ref = []
    for i in range(steps):
        x_ref = oracle.step(i, vs[i], x_ref)
        traj_ref.append(x_ref.copy())

    coeffs = precompute_unipc(sig)
    arrs = coeffs.device_arrays()
    state = unipc_init_state(jnp.asarray(x0, jnp.float32))
    traj = []
    for i in range(steps):
        c = {k: v[i] for k, v in arrs.items()}
        state = unipc_step(state, c, jnp.asarray(vs[i], jnp.float32))
        traj.append(np.asarray(state["sample"]))

    for i in range(steps):
        np.testing.assert_allclose(traj[i], traj_ref[i], rtol=2e-4,
                                   atol=2e-4, err_msg=f"step {i}")


def test_unipc_exact_linear_flow():
    """v = (x - x0)/sigma is the exact flow field; the solver must land on
    x0 (the schedule ends at sigma=0, last predictor returns m)."""
    steps = 8
    sig, _ = flow_sigmas(steps, shift=3.0)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    x = (1 - sig[0]) * x0 + sig[0] * eps

    coeffs = precompute_unipc(sig)
    arrs = coeffs.device_arrays()
    state = unipc_init_state(jnp.asarray(x))
    for i in range(steps):
        c = {k: v[i] for k, v in arrs.items()}
        v_field = (state["sample"] - x0) / max(float(sig[i]), 1e-12)
        state = unipc_step(state, c, v_field)
    np.testing.assert_allclose(np.asarray(state["sample"]), x0, rtol=1e-3,
                               atol=1e-3)


def test_dpm_exact_linear_flow():
    steps = 8
    sig, _ = flow_sigmas(steps, shift=3.0)
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    x = (1 - sig[0]) * x0 + sig[0] * eps

    coeffs = precompute_dpm_solver(sig)
    arrs = coeffs.device_arrays()
    state = dpm_init_state(jnp.asarray(x))
    for i in range(steps):
        c = {k: v[i] for k, v in arrs.items()}
        v_field = (state["sample"] - x0) / max(float(sig[i]), 1e-12)
        state = dpm_step(state, c, v_field)
    np.testing.assert_allclose(np.asarray(state["sample"]), x0, rtol=1e-3,
                               atol=1e-3)


def test_euler_and_add_noise():
    x0 = jnp.asarray([[1.0, -1.0]])
    eps = jnp.asarray([[0.5, 0.5]])
    xt = add_flow_noise(x0, eps, 0.25)
    np.testing.assert_allclose(np.asarray(xt), [[0.875, -0.625]])
    # exact Euler over the whole interval with true velocity eps - x0
    v = eps - x0
    out = euler_flow_step(xt, v, 0.25, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_dpm_order3_exact_linear_flow():
    """Order-3 DPM++ (fm_solvers.py:598-680) also lands exactly on x0 for
    the exact linear flow field."""
    steps = 8
    sig, _ = flow_sigmas(steps, shift=3.0)
    rng = np.random.default_rng(3)
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    x = (1 - sig[0]) * x0 + sig[0] * eps

    coeffs = precompute_dpm_solver(sig, solver_order=3)
    arrs = coeffs.device_arrays()
    state = dpm_init_state(jnp.asarray(x), order=3)
    for i in range(steps):
        c = {k: v[i] for k, v in arrs.items()}
        v_field = (state["sample"] - x0) / max(float(sig[i]), 1e-12)
        state = dpm_step(state, c, v_field)
    np.testing.assert_allclose(np.asarray(state["sample"]), x0, rtol=1e-3,
                               atol=1e-3)


def test_dpm_order3_beats_order2_on_nonlinear_field():
    """Convergence order: on a sigma-dependent x0-prediction the order-3
    update is at least as accurate as order-2 at the same step count."""
    steps = 10
    sig, _ = flow_sigmas(steps, shift=3.0)
    rng = np.random.default_rng(4)
    base = rng.standard_normal((4, 4)).astype(np.float64)

    def m_of_sigma(s):  # the model's x0-prediction, varies with sigma
        return base * (1.0 + 0.4 * np.sin(3.0 * s))

    def v_field(x, s):
        return (x - m_of_sigma(s)) / max(s, 1e-12)

    eps = rng.standard_normal((4, 4)).astype(np.float64)
    x_init = (1 - sig[0]) * m_of_sigma(sig[0]) + sig[0] * eps

    # dense-Euler ground truth over the same sigma ladder
    fine = np.linspace(sig[0], 0.0, 4097)
    x_true = x_init.copy()
    for a, b in zip(fine[:-1], fine[1:]):
        x_true = x_true + v_field(x_true, a) * (b - a)

    def run(order):
        coeffs = precompute_dpm_solver(sig, solver_order=order)
        arrs = coeffs.device_arrays()
        state = dpm_init_state(jnp.asarray(x_init.astype(np.float32)),
                               order=order)
        for i in range(steps):
            c = {k: v[i] for k, v in arrs.items()}
            vf = v_field(np.asarray(state["sample"], np.float64),
                         float(sig[i]))
            state = dpm_step(state, c, jnp.asarray(vf.astype(np.float32)))
        return np.asarray(state["sample"], np.float64)

    err2 = np.abs(run(2) - x_true).max()
    err3 = np.abs(run(3) - x_true).max()
    assert err3 <= err2 * 1.05, (err2, err3)
