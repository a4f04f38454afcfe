"""ODE example — RK45 adaptive + BDF2 on a stiff problem, vmapped batches."""
import jax
import jax.numpy as jnp
import numpy as np

from tpukk.ode import RKType, bdf_solve, rk_solve


def main():
    res = rk_solve(lambda t, y: -y, jnp.array([1.0]), 0.0, 1.0, kind=RKType.RKDP)
    print(f"RKDP adaptive: y(1) = {float(res.y[0]):.8f} (exact {np.exp(-1):.8f}), "
          f"steps = {int(res.num_steps)}")

    stiff = lambda t, y: -50.0 * (y - jnp.cos(t))
    r2 = bdf_solve(stiff, jnp.array([0.0]), 0.0, 2.0, num_steps=80, order=2)
    print(f"BDF2 stiff: y(2) = {float(r2.y[0]):.5f} (~cos(2) = {np.cos(2):.5f})")

    batch = jax.vmap(lambda y0: rk_solve(lambda t, y: -y, y0, 0.0, 1.0,
                                         kind=RKType.RK4, num_steps=50).y)
    ys = batch(jnp.linspace(0.5, 2.0, 16)[:, None])
    print("vmapped RK4 batch:", np.asarray(ys[:3, 0]))

    # adaptive order+step BDF (KokkosODE BDFSolve analog): Robertson kinetics
    from tpukk.ode import bdf_solve_adaptive

    def rob(t, y):
        return jnp.array([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    ra = bdf_solve_adaptive(rob, jnp.array([1.0, 0.0, 0.0]), 0.0, 100.0,
                            rtol=1e-6, atol=1e-9)
    print(f"adaptive BDF Robertson: y(100) = {np.asarray(ra.y)}, "
          f"accepted steps = {int(ra.num_steps)}")


if __name__ == "__main__":
    main()
