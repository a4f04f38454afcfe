"""ODE tests against analytic solutions — analog of
ode/unit_test/Test_ODE_{RK,BDF,Newton}.hpp + Test_ODE_TestProblems.hpp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpukk.ode import RKType, bdf_solve, newton_solve, rk_solve


def exp_decay(t, y):
    return -y


def harmonic(t, y):
    return jnp.stack([y[1], -y[0]])


def stiff(t, y):
    return -50.0 * (y - jnp.cos(t))


ALL_RK = list(RKType)


@pytest.mark.parametrize("kind", ALL_RK)
def test_rk_exp_decay(kind):
    y0 = jnp.array([1.0])
    res = rk_solve(exp_decay, y0, 0.0, 1.0, kind=kind, num_steps=200)
    err = abs(float(res.y[0]) - np.exp(-1.0))
    tol = 1e-2 if kind in (RKType.RKFE, RKType.RKEH, RKType.RKF12) else 1e-6
    assert err < tol


@pytest.mark.parametrize("kind", [RKType.RKBS, RKType.RKF45, RKType.RKCK, RKType.RKDP, RKType.VER56])
def test_rk_adaptive_harmonic(kind):
    y0 = jnp.array([1.0, 0.0])
    res = rk_solve(harmonic, y0, 0.0, 2 * np.pi, kind=kind, rel_tol=1e-8, abs_tol=1e-10)
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(res.y), [1.0, 0.0], atol=1e-5)


def test_rk_counts_adaptive_fewer_steps_when_loose():
    y0 = jnp.array([1.0])
    tight = rk_solve(exp_decay, y0, 0.0, 1.0, kind=RKType.RKDP, rel_tol=1e-10, abs_tol=1e-12)
    loose = rk_solve(exp_decay, y0, 0.0, 1.0, kind=RKType.RKDP, rel_tol=1e-3, abs_tol=1e-5)
    assert int(loose.num_steps) <= int(tight.num_steps)


def test_rk_vmapped_batch():
    y0s = jnp.linspace(0.5, 2.0, 8)[:, None]
    f = jax.vmap(lambda y0: rk_solve(exp_decay, y0, 0.0, 1.0, kind=RKType.RK4, num_steps=100).y)
    ys = f(y0s)
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.asarray(y0s[:, 0]) * np.exp(-1.0), rtol=1e-6)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 6])
def test_bdf_exp_decay(order):
    y0 = jnp.array([1.0])
    res = bdf_solve(exp_decay, y0, 0.0, 1.0, num_steps=200, order=order)
    assert bool(res.converged)
    tol = 5e-3 if order == 1 else 1e-4
    assert abs(float(res.y[0]) - np.exp(-1.0)) < tol


def test_bdf_stiff():
    y0 = jnp.array([0.0])
    res = bdf_solve(stiff, y0, 0.0, 2.0, num_steps=100, order=2)
    assert bool(res.converged)
    # solution tracks cos(t) closely after transient
    assert abs(float(res.y[0]) - np.cos(2.0)) < 0.05


def test_newton_scalar_system():
    def f(x):
        return jnp.stack([x[0] ** 2 + x[1] ** 2 - 4.0, x[0] - x[1]])

    res = newton_solve(f, jnp.array([1.0, 0.5]))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), [np.sqrt(2), np.sqrt(2)], rtol=1e-8)


def test_newton_with_explicit_jacobian():
    def f(x, a):
        return jnp.array([x[0] ** 3 - a])

    def jac(x, a):
        return jnp.array([[3 * x[0] ** 2]])

    res = newton_solve(f, jnp.array([1.0]), jac=jac, args=(8.0,))
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.x[0]), 2.0, rtol=1e-10)


class TestBDFAdaptive:
    """Adaptive order+step BDF — analog of KokkosODE::Experimental::BDFSolve
    (KokkosODE_BDF.hpp:137-184); oracle = scipy.integrate BDF."""

    def test_exp_decay(self):
        from tpukk.ode import bdf_solve_adaptive

        r = bdf_solve_adaptive(lambda t, y: -y, jnp.array([1.0]), 0.0, 2.0,
                               rtol=1e-8, atol=1e-10)
        assert int(r.status) == 0
        assert abs(float(r.y[0]) - np.exp(-2.0)) < 1e-6
        # adaptivity: far fewer steps than a fixed-step run at this accuracy
        assert int(r.num_steps) < 200

    def test_stiff_linear(self):
        from scipy.integrate import solve_ivp

        from tpukk.ode import bdf_solve_adaptive

        f = lambda t, y: -1000.0 * (y - jnp.cos(t))
        r = bdf_solve_adaptive(f, jnp.array([0.0]), 0.0, 1.0,
                               rtol=1e-7, atol=1e-10)
        ref = solve_ivp(lambda t, y: -1000 * (y - np.cos(t)), (0, 1), [0.0],
                        method="BDF", rtol=1e-10, atol=1e-12)
        assert int(r.status) == 0
        assert abs(float(r.y[0]) - ref.y[0, -1]) < 1e-6

    def test_robertson(self):
        from scipy.integrate import solve_ivp

        from tpukk.ode import bdf_solve_adaptive

        def rob(t, y):
            return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                              0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                              3e7 * y[1] ** 2])

        r = bdf_solve_adaptive(rob, jnp.array([1.0, 0.0, 0.0]), 0.0, 100.0,
                               rtol=1e-7, atol=1e-10, max_steps=20000)
        ref = solve_ivp(
            lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2],
            (0, 100), [1.0, 0, 0], method="BDF", rtol=1e-10, atol=1e-13)
        assert int(r.status) == 0
        np.testing.assert_allclose(np.asarray(r.y), ref.y[:, -1],
                                   rtol=1e-4, atol=1e-9)

    def test_vmap_batched(self):
        # team-level analog (SURVEY §3.5): vmap over many stiff systems
        from scipy.integrate import solve_ivp

        from tpukk.ode import bdf_solve_adaptive

        rates = jnp.asarray(np.linspace(1.0, 900.0, 8))

        def solve_one(rate):
            f = lambda t, y: -rate * (y - jnp.cos(t))
            return bdf_solve_adaptive(f, jnp.array([0.0]), 0.0, 1.0,
                                      rtol=1e-6, atol=1e-9)

        r = jax.vmap(solve_one)(rates)
        assert int(np.asarray(r.status).max()) == 0
        for i, k in enumerate(np.asarray(rates)):
            ref = solve_ivp(lambda t, y: -k * (y - np.cos(t)), (0, 1), [0.0],
                            method="BDF", rtol=1e-9, atol=1e-12)
            assert abs(float(r.y[i, 0]) - ref.y[0, -1]) < 1e-4
