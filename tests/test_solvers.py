"""SpTRSV / SpILUK / GMRES / PCG / trsv tests — residual/invariant oracles
(the reference checks ||A-LU|| on the pattern and convergence flags:
Test_Sparse_spiluk.hpp, Test_Sparse_gmres.hpp; gmres example parity:
example/gmres/ex_real_A.cpp)."""
import numpy as np
import pytest
import scipy.sparse as sps

from tpukk.containers import CsrMatrix, generate_diag_dominant_csr, generate_structured_laplacian
from tpukk.sparse.gmres import GmresHandle, Ortho, gmres
from tpukk.sparse.pcg import pcg
from tpukk.sparse.preconditioner import GsPrec, JacobiPrec, LUPrec
from tpukk.sparse.spiluk import SpilukHandle, spiluk_numeric, spiluk_symbolic
from tpukk.sparse.sptrsv import SptrsvAlgorithm, SptrsvHandle, sptrsv_solve, sptrsv_symbolic
from tpukk.sparse.trsv import trsv


def _tri(A, lower, unit=False):
    sp = A.to_scipy()
    T = sps.tril(sp) if lower else sps.triu(sp)
    T = T.tocsr()
    T.setdiag(np.abs(T.diagonal()) + 2.0)
    if unit:
        T.setdiag(1.0)
    T.sort_indices()
    return CsrMatrix.from_scipy(T.astype(np.float64))


class TestSptrsv:
    @pytest.mark.parametrize("lower", [True, False])
    def test_solve(self, lower, rng):
        A = generate_diag_dominant_csr(80, 4, dtype=np.float64, seed=2)
        T = _tri(A, lower)
        h = SptrsvHandle(lower=lower)
        sptrsv_symbolic(h, T)
        assert h.num_levels >= 1
        b = rng.standard_normal(T.nrows)
        x = np.asarray(sptrsv_solve(h, T, b))
        np.testing.assert_allclose(T.to_scipy() @ x, b, rtol=1e-10, atol=1e-10)

    def test_laplacian_lower(self, rng):
        A = generate_structured_laplacian(12, 12, dtype=np.float64)
        T = _tri(A, True)
        h = SptrsvHandle(True)
        sptrsv_symbolic(h, T)
        b = rng.standard_normal(T.nrows)
        x = np.asarray(sptrsv_solve(h, T, b))
        np.testing.assert_allclose(T.to_scipy() @ x, b, rtol=1e-10, atol=1e-10)

    @pytest.mark.parametrize("lower", [True, False])
    def test_fused_pallas_interpret(self, lower, rng):
        """Whole-solve fused pallas kernel (interpret mode) vs scipy —
        covers the TPU-only route of sptrsv_pallas.py."""
        import jax.numpy as jnp

        from tpukk.sparse import sptrsv as st
        from tpukk.sparse.sptrsv_pallas import (build_fused_sptrsv_plan,
                                                fused_sptrsv_solve)

        A = generate_structured_laplacian(9, 9, dtype=np.float32)
        T = _tri(A, lower)
        Ts = T.to_scipy().astype(np.float32)
        Tf = CsrMatrix.from_scipy(Ts)
        rm, ent = Tf.host_row_map(), Tf.host_entries()
        vals = np.asarray(Tf.values)
        levels = st._compute_levels(rm, ent, Tf.nrows, lower)
        plan = build_fused_sptrsv_plan(rm, ent, vals, Tf.nrows, levels, lower)
        assert plan is not None
        b = rng.standard_normal(Tf.nrows).astype(np.float32)
        x = np.asarray(fused_sptrsv_solve(plan, jnp.asarray(b), interpret=True))
        xs = sps.linalg.spsolve_triangular(Ts.tocsr(), b, lower=lower)
        err = np.abs(x - xs).max() / max(np.abs(xs).max(), 1e-30)
        assert err < 1e-5
        # values-only numeric refresh on the cached symbolic structure
        vals2 = vals * 1.7
        plan.refresh_values(rm, ent, vals2, lower)
        x2 = np.asarray(fused_sptrsv_solve(plan, jnp.asarray(b), interpret=True))
        xs2 = sps.linalg.spsolve_triangular(
            sps.csr_matrix((vals2, ent, rm), shape=Ts.shape), b, lower=lower)
        err2 = np.abs(x2 - xs2).max() / max(np.abs(xs2).max(), 1e-30)
        assert err2 < 1e-5


class TestSpiluk:
    @pytest.mark.parametrize("k", [0, 1, 2])
    def test_factorization_residual_shrinks_with_k(self, k):
        A = generate_diag_dominant_csr(60, 5, dtype=np.float64, seed=4)
        h = SpilukHandle(fill_level=k)
        nnz = spiluk_symbolic(h, A)
        assert nnz >= A.nnz
        L, U = spiluk_numeric(h, A)
        # L unit-lower, U upper
        assert np.allclose(L.to_scipy().diagonal(), 1.0)
        prod = (L.to_scipy() @ U.to_scipy()).tocsr()
        # on the A pattern, L·U must reproduce A for ILU(0)-style consistency
        diff = (prod - A.to_scipy()).multiply(A.to_scipy() != 0)
        assert np.abs(diff.data).max(initial=0.0) < 1e-10

    def test_ilu0_exact_on_pattern(self):
        A = generate_diag_dominant_csr(40, 4, dtype=np.float64, seed=5)
        h = SpilukHandle(0)
        spiluk_symbolic(h, A)
        L, U = spiluk_numeric(h, A)
        # ILU(0): pattern of L+U equals pattern of A (with diag)
        patA = A.to_scipy().copy()
        patA.setdiag(patA.diagonal())
        lu_pat = (L.to_scipy() + U.to_scipy()).tocsr()
        assert lu_pat.nnz <= patA.nnz + A.nrows


class TestGmres:
    @pytest.mark.parametrize("ortho", [Ortho.CGS2, Ortho.MGS])
    def test_unpreconditioned(self, ortho, rng):
        A = generate_diag_dominant_csr(100, 5, dtype=np.float64, seed=6)
        x_true = rng.standard_normal(A.nrows)
        b = A.to_scipy() @ x_true
        h = GmresHandle(m=40, tol=1e-10, max_restarts=10, ortho=ortho)
        x, stats = gmres(h, A, b)
        assert stats.converged
        np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-6)

    def test_ilu_preconditioned_fewer_iters(self, rng):
        # example/gmres parity: ILU(0)-preconditioned GMRES converges faster
        A = generate_diag_dominant_csr(120, 6, dtype=np.float64, seed=7)
        b = rng.standard_normal(A.nrows)
        h0 = GmresHandle(m=10, tol=1e-9, max_restarts=40)
        _, s0 = gmres(h0, A, b)
        hk = SpilukHandle(0)
        spiluk_symbolic(hk, A)
        L, U = spiluk_numeric(hk, A)
        h1 = GmresHandle(m=10, tol=1e-9, max_restarts=40)
        _, s1 = gmres(h1, A, b, prec=LUPrec(L, U))
        assert s1.converged
        assert s1.num_iters <= s0.num_iters

    def test_ilu_jacobi_sweep_apply(self, rng):
        """Inexact Jacobi-sweep triangular solves in LUPrec: still a valid
        fixed preconditioner — GMRES converges, and with enough sweeps the
        apply matches the exact sptrsv apply."""
        A = generate_diag_dominant_csr(120, 6, dtype=np.float64, seed=7)
        b = rng.standard_normal(A.nrows)
        hk = SpilukHandle(0)
        spiluk_symbolic(hk, A)
        L, U = spiluk_numeric(hk, A)
        exact = LUPrec(L, U)
        jac = LUPrec(L, U, jacobi_sweeps=3)
        h0 = GmresHandle(m=10, tol=1e-9, max_restarts=40)
        _, s0 = gmres(h0, A, b)
        h1 = GmresHandle(m=10, tol=1e-9, max_restarts=40)
        _, s1 = gmres(h1, A, b, prec=jac)
        assert s1.converged
        assert s1.num_iters <= s0.num_iters
        # many sweeps -> the exact apply (diag-dominant factors contract fast)
        jac_hi = LUPrec(L, U, jacobi_sweeps=60)
        ya = np.asarray(exact.apply(b))
        yb = np.asarray(jac_hi.apply(b))
        assert np.abs(ya - yb).max() < 1e-8 * max(1.0, np.abs(ya).max())

    def test_singular_rhs_zero(self):
        A = generate_diag_dominant_csr(30, 3, dtype=np.float64, seed=8)
        b = np.zeros(A.nrows)
        h = GmresHandle(m=10, tol=1e-10, max_restarts=3)
        x, stats = gmres(h, A, b)
        assert np.allclose(np.asarray(x), 0.0)


class TestPcg:
    def _spd(self, n=20):
        A = generate_structured_laplacian(n, n, dtype=np.float64)
        sp = A.to_scipy()
        sp.setdiag(sp.diagonal() + 0.1)
        return CsrMatrix.from_scipy(sp.tocsr())

    def test_jacobi_prec(self, rng):
        A = self._spd()
        b = rng.standard_normal(A.nrows)
        x, stats = pcg(A, b, tol=1e-10, max_iters=2000, prec=JacobiPrec(A))
        assert stats.converged
        np.testing.assert_allclose(A.to_scipy() @ np.asarray(x), b, rtol=1e-7, atol=1e-7)

    def test_gs_prec_accelerates(self, rng):
        from tpukk.sparse.gauss_seidel import GsAlgorithm, GsHandle, gauss_seidel_numeric, gauss_seidel_symbolic

        A = self._spd(16)
        b = rng.standard_normal(A.nrows)
        _, s_plain = pcg(A, b, tol=1e-9, max_iters=2000, check_every=5)
        gh = GsHandle(GsAlgorithm.POINT)
        gauss_seidel_symbolic(gh, A)
        gauss_seidel_numeric(gh, A)
        _, s_gs = pcg(A, b, tol=1e-9, max_iters=2000, prec=GsPrec(gh, A), check_every=5)
        assert s_gs.converged
        assert s_gs.num_iters <= s_plain.num_iters


class TestTrsv:
    def test_modes(self, rng):
        A = generate_diag_dominant_csr(50, 4, dtype=np.float64, seed=9)
        b = rng.standard_normal(A.nrows)
        for uplo in ["L", "U"]:
            T = _tri(A, uplo == "L")
            x = np.asarray(trsv(uplo, "N", "N", T, b))
            ref = (sps.tril(T.to_scipy()) if uplo == "L" else sps.triu(T.to_scipy()))
            np.testing.assert_allclose(ref @ x, b, rtol=1e-10, atol=1e-10)
            xt = np.asarray(trsv(uplo, "T", "N", T, b))
            np.testing.assert_allclose(ref.T @ xt, b, rtol=1e-10, atol=1e-10)

    def test_unit_diag_and_mv(self, rng):
        A = generate_diag_dominant_csr(30, 3, dtype=np.float64, seed=10)
        T = _tri(A, True, unit=False)
        B = rng.standard_normal((T.nrows, 3))
        X = np.asarray(trsv("L", "N", "U", T, B))
        Tu = sps.tril(T.to_scipy(), k=-1) + sps.identity(T.nrows)
        np.testing.assert_allclose(Tu @ X, B, rtol=1e-10, atol=1e-10)


class TestSptrsvSupernodal:
    """Supernodal mode (SUPERNODAL_NAIVE/ETREE analog,
    KokkosSparse_sptrsv_supernode.hpp:87-140): pattern-detected supernodes,
    batched dense diag solves + panel updates."""

    @staticmethod
    def _blocked_lower(n, bs, rng):
        """Lower-tri CSR with genuine supernode structure: dense (bs,bs)
        diagonal blocks + per-block shared dense row panels."""
        import scipy.sparse as sps
        rows, cols, vals = [], [], []
        nb = n // bs
        for k in range(nb):
            s = k * bs
            for i in range(bs):
                for j in range(i + 1):
                    rows.append(s + i); cols.append(s + j)
                    vals.append(rng.standard_normal() + (4.0 if i == j else 0))
            # panel: a few shared rows below, dense across the block's columns
            below = np.arange(s + bs, n)
            if len(below):
                pr = rng.choice(below, size=min(3, len(below)), replace=False)
                for r in pr:
                    for j in range(bs):
                        rows.append(r); cols.append(s + j)
                        vals.append(rng.standard_normal())
        T = sps.csr_matrix((vals, (rows, cols)), shape=(n, n))
        T.sum_duplicates(); T.sort_indices()
        return T

    @pytest.mark.parametrize("lower", [True, False])
    def test_blocked(self, lower, rng):
        from tpukk.sparse.sptrsv import SptrsvAlgorithm
        T = self._blocked_lower(96, 8, rng)
        if not lower:
            T = T.T.tocsr()
        M = CsrMatrix.from_scipy(T.astype(np.float64))
        h = SptrsvHandle(lower=lower, algorithm=SptrsvAlgorithm.SUPERNODAL)
        sptrsv_symbolic(h, M)
        # detection must actually merge columns on this structured factor
        assert h.sn_plan.num_supernodes < M.nrows
        assert h.sn_plan.max_block > 1
        b = rng.standard_normal(M.nrows)
        x = np.asarray(sptrsv_solve(h, M, b))
        np.testing.assert_allclose(T @ x, b, rtol=1e-10, atol=1e-10)

    @pytest.mark.parametrize("lower", [True, False])
    def test_random_degenerate(self, lower, rng):
        # unstructured factor: supernodes mostly size 1 — must still be exact
        from tpukk.sparse.sptrsv import SptrsvAlgorithm
        A = generate_diag_dominant_csr(70, 4, dtype=np.float64, seed=9)
        T = _tri(A, lower)
        h = SptrsvHandle(lower=lower, algorithm=SptrsvAlgorithm.SUPERNODAL)
        sptrsv_symbolic(h, T)
        b = rng.standard_normal(T.nrows)
        x = np.asarray(sptrsv_solve(h, T, b))
        np.testing.assert_allclose(T.to_scipy() @ x, b, rtol=1e-10, atol=1e-10)

    def test_matches_levelset_on_iluk_factor(self, rng):
        from tpukk.sparse.sptrsv import SptrsvAlgorithm
        A = generate_structured_laplacian(10, 10, dtype=np.float64)
        hI = SpilukHandle(fill_level=1)
        spiluk_symbolic(hI, A)
        L, U = spiluk_numeric(hI, A)
        b = rng.standard_normal(A.nrows)
        for M, lower in ((L, True), (U, False)):
            h1 = SptrsvHandle(lower=lower)
            sptrsv_symbolic(h1, M)
            h2 = SptrsvHandle(lower=lower, algorithm=SptrsvAlgorithm.SUPERNODAL)
            sptrsv_symbolic(h2, M)
            x1 = np.asarray(sptrsv_solve(h1, M, b))
            x2 = np.asarray(sptrsv_solve(h2, M, b))
            np.testing.assert_allclose(x1, x2, rtol=1e-9, atol=1e-9)

    def test_supernodal_fewer_levels(self, rng):
        from tpukk.sparse.sptrsv import SptrsvAlgorithm
        T = self._blocked_lower(128, 16, rng)
        M = CsrMatrix.from_scipy(T.astype(np.float64))
        h1 = SptrsvHandle(True)
        sptrsv_symbolic(h1, M)
        h2 = SptrsvHandle(True, algorithm=SptrsvAlgorithm.SUPERNODAL)
        sptrsv_symbolic(h2, M)
        assert h2.num_levels <= h1.num_levels


class TestSuperLUImport:
    """External-factor import (the SuperLU/CHOLMOD adapter role,
    sptrsv_superlu.hpp:87-140): scipy factorizes, tpukk solves."""

    def test_exact_solve(self, rng):
        import scipy.sparse.linalg as spla
        from tpukk.sparse import superlu_import

        A = generate_diag_dominant_csr(120, 5, dtype=np.float64, seed=21)
        lu = spla.splu(A.to_scipy().tocsc())
        solver = superlu_import(lu)
        b = rng.standard_normal(A.nrows)
        x = solver(b)
        ref = spla.spsolve(A.to_scipy().tocsc(), b)
        np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-10)

    def test_supernodal_algorithm(self, rng):
        import scipy.sparse.linalg as spla
        from tpukk.sparse import SptrsvAlgorithm, superlu_import

        A = generate_diag_dominant_csr(80, 4, dtype=np.float64, seed=22)
        lu = spla.splu(A.to_scipy().tocsc())
        solver = superlu_import(lu, algorithm=SptrsvAlgorithm.SUPERNODAL)
        b = rng.standard_normal(A.nrows)
        x = solver(b)
        r = A.to_scipy() @ x - b
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-9

    def test_as_gmres_preconditioner(self, rng):
        import scipy.sparse.linalg as spla
        from tpukk.sparse import superlu_import
        from tpukk.sparse.gmres import GmresHandle, gmres

        A = generate_diag_dominant_csr(100, 5, dtype=np.float64, seed=23)
        b = rng.standard_normal(A.nrows)
        lu = spla.splu(A.to_scipy().tocsc())
        prec = superlu_import(lu)
        h = GmresHandle(m=10, tol=1e-10, max_restarts=10)
        _, stats = gmres(h, A, b, prec=prec)
        assert stats.converged
        # exact LU preconditioner: converges within the first restart cycle
        assert stats.num_iters <= 10
        assert stats.end_rel_res < 1e-12


class TestSpilukDeviceRefresh:
    """Device value-refresh == host IKJ factorization (the reference's
    _spiluk_numeric_impl.hpp level-parallel numeric, here as depth-many
    synchronous Chow sweeps in one jit — exact, see spiluk.py docstring)."""

    @pytest.mark.parametrize("fill_k", [0, 2])
    def test_refresh_matches_host(self, fill_k):
        from tpukk.sparse.spiluk import (build_iluk_refresh, refresh_to_csr,
                                         spiluk_refresh)

        A = generate_diag_dominant_csr(250, 5, dtype=np.float64, seed=9)
        h = SpilukHandle(fill_level=fill_k)
        spiluk_symbolic(h, A)
        assert h.depth is None or h.depth >= 1
        L, U = spiluk_numeric(h, A)
        plan = build_iluk_refresh(h, A)
        sp = A.to_scipy().tocsr()
        sp.sort_indices()
        lv, uv = spiluk_refresh(plan, sp.data)
        Ld, Ud = refresh_to_csr(plan, lv, uv)
        scale = np.abs(np.asarray(U.to_scipy().data)).max()
        assert np.abs((Ld.to_scipy() - L.to_scipy())).max() < 1e-11 * scale
        assert np.abs((Ud.to_scipy() - U.to_scipy())).max() < 1e-11 * scale

    def test_refresh_new_values_no_resymbolic(self):
        # time-stepping use case: same pattern, new values
        from tpukk.sparse.spiluk import (build_iluk_refresh, refresh_to_csr,
                                         spiluk_refresh)

        A = generate_diag_dominant_csr(150, 4, dtype=np.float64, seed=4)
        h = SpilukHandle(fill_level=1)
        spiluk_symbolic(h, A)
        plan = build_iluk_refresh(h, A)
        sp = A.to_scipy().tocsr()
        sp.sort_indices()
        rng = np.random.default_rng(0)
        new_vals = sp.data * (1.0 + 0.1 * rng.standard_normal(sp.nnz))
        sp2 = sps.csr_matrix((new_vals, sp.indices, sp.indptr), shape=sp.shape)
        A2 = CsrMatrix.from_scipy(sp2)
        L2, U2 = spiluk_numeric(h, A2)      # host oracle on the new values
        lv, uv = spiluk_refresh(plan, new_vals)
        Ld, Ud = refresh_to_csr(plan, lv, uv)
        scale = np.abs(np.asarray(U2.to_scipy().data)).max()
        assert np.abs((Ld.to_scipy() - L2.to_scipy())).max() < 1e-11 * scale
        assert np.abs((Ud.to_scipy() - U2.to_scipy())).max() < 1e-11 * scale


class TestCholmodImport:
    """CHOLMOD-format supernodal factor import (read_cholmod_factor role,
    KokkosSparse_sptrsv_cholmod.hpp).  No CHOLMOD in-environment, so the
    raw cholmod_factor arrays are manufactured from a scipy Cholesky
    factor with a known supernode partition — exactly the struct fields
    the importer decodes."""

    @staticmethod
    def _raw_from_dense_chol(Ls, partition):
        """Pack a lower-tri scipy matrix into CHOLMOD supernodal raw arrays
        given a monotone column partition (list of supernode sizes)."""
        n = Ls.shape[0]
        Ld = np.asarray(Ls.todense())
        super_, pi, px, s, x = [0], [0], [0], [], []
        for sz in partition:
            c0 = super_[-1]
            c1 = c0 + sz
            # union row pattern of the supernode's columns (incl diag block)
            pat = set(range(c0, c1))
            for c in range(c0, c1):
                pat |= set(np.nonzero(Ld[:, c])[0][np.nonzero(Ld[:, c])[0] >= c])
            ridx = np.array(sorted(pat), np.int64)
            panel = Ld[ridx][:, c0:c1]         # (nrows, ncols) col-major pack
            s.extend(ridx.tolist())
            x.extend(panel.T.ravel().tolist())
            super_.append(c1)
            pi.append(len(s))
            px.append(len(x))
        return (np.array(super_), np.array(pi), np.array(px),
                np.array(s), np.array(x))

    @pytest.mark.parametrize("algorithm", [SptrsvAlgorithm.SEQLVLSCHD,
                                           SptrsvAlgorithm.SUPERNODAL])
    def test_raw_import_solves(self, algorithm, rng):
        from tpukk.sparse.sptrsv import SptrsvAlgorithm as Alg
        from tpukk.sparse.sptrsv_cholmod import cholmod_import

        n = 48
        A = generate_structured_laplacian(6, 8, dtype=np.float64).to_scipy()
        A = (A + 0.5 * sps.identity(n)).tocsc()
        Ld = np.linalg.cholesky(np.asarray(A.todense()))
        Ls = sps.csr_matrix(Ld)
        # partition: run of 3 singletons, a 5-block, rest in 4s
        sizes, left = [1, 1, 1, 5], n - 8
        while left > 0:
            sizes.append(min(4, left))
            left -= min(4, left)
        super_, pi, px, s, x = self._raw_from_dense_chol(Ls, sizes)
        perm = np.arange(n)
        solver = cholmod_import(n=n, super_=super_, pi=pi, px=px, s=s, x=x,
                                perm=perm, algorithm=algorithm)
        b = rng.standard_normal(n)
        xs = np.asarray(solver(b))
        ref = np.linalg.solve(np.asarray(A.todense()), b)
        np.testing.assert_allclose(xs, ref, rtol=1e-8, atol=1e-8)

    def test_raw_import_with_permutation(self, rng):
        from tpukk.sparse.sptrsv_cholmod import cholmod_import

        n = 30
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        perm = rng.permutation(n)
        Ap = A[perm][:, perm]
        Ld = np.linalg.cholesky(Ap)
        Ls = sps.csr_matrix(Ld)
        super_, pi, px, s, x = self._raw_from_dense_chol(Ls, [n])  # 1 big sn
        solver = cholmod_import(n=n, super_=super_, pi=pi, px=px, s=s, x=x,
                                perm=perm)
        b = rng.standard_normal(n)
        xs = np.asarray(solver(b))
        np.testing.assert_allclose(xs, np.linalg.solve(A, b),
                                   rtol=1e-8, atol=1e-8)


class TestFusedSupernodal:
    """Whole-solve fused supernodal reduction (FusedSupernodalPlan): the
    solve rides the wide fused kernel over an expanded unit-lower DAG
    (z-rows with C = P.Dinv entries, partial-sum aux rows, relay ladders,
    x-rows applying Dinv) — reference analog: the SUPERNODAL_SPMV mode of
    sparse/impl/KokkosSparse_sptrsv_solve_impl.hpp (inverted diagonal
    blocks turn every level into a matvec)."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(77)

    @pytest.mark.parametrize("lower", [True, False])
    def test_splu_factor_interpret(self, lower, rng):
        import jax.numpy as jnp
        import scipy.sparse.linalg as spla
        from tpukk.containers import generate_structured_laplacian
        from tpukk.sparse.sptrsv_supernodal import (
            build_supernodal_fused_plan, supernodal_solve)

        A = generate_structured_laplacian(14, 14, dtype=np.float64)
        lu = spla.splu(A.to_scipy().tocsc())
        T = (lu.L if lower else lu.U).tocsr().astype(np.float32)
        T.sort_indices()
        n = T.shape[0]
        plan = build_supernodal_fused_plan(
            T.indptr, T.indices, T.data, n, lower=lower)
        assert plan is not None, "fused supernodal plan outside gates"
        assert plan.num_rows_dag > n      # aux/relay/x rows present
        b = rng.standard_normal(n).astype(np.float32)
        x = np.asarray(supernodal_solve(plan, jnp.asarray(b),
                                        interpret=True))
        ref = spla.spsolve_triangular(T.astype(np.float64),
                                      b.astype(np.float64), lower=lower)
        scale = np.abs(ref).max()
        assert np.abs(x - ref).max() / scale < 5e-5

    def test_imported_partition_interpret(self, rng):
        """sn_of_col import path (CHOLMOD adapter role) through the fused
        reduction."""
        import jax.numpy as jnp
        import scipy.sparse.linalg as spla
        from tpukk.containers import generate_structured_laplacian
        from tpukk.sparse.sptrsv_supernodal import (
            build_supernodal_fused_plan, supernodal_solve)

        A = generate_structured_laplacian(12, 12, dtype=np.float64)
        lu = spla.splu(A.to_scipy().tocsc())
        T = lu.L.tocsr().astype(np.float32)
        T.sort_indices()
        n = T.shape[0]
        part = np.arange(n) // 4        # blocked monotone partition
        plan = build_supernodal_fused_plan(
            T.indptr, T.indices, T.data, n, lower=True, sn_of_col=part)
        assert plan is not None
        b = rng.standard_normal(n).astype(np.float32)
        x = np.asarray(supernodal_solve(plan, jnp.asarray(b),
                                        interpret=True))
        ref = spla.spsolve_triangular(T.astype(np.float64),
                                      b.astype(np.float64), lower=True)
        assert np.abs(x - ref).max() / np.abs(ref).max() < 5e-5


def test_gmres_rcm_reorder_matches_direct():
    """gmres(reorder) runs the Krylov loop in RCM space; orthogonal
    invariance makes the iterates identical — the returned solution must
    match the non-reordered solve to solver tolerance."""
    import jax.numpy as jnp
    from tpukk.containers import CsrMatrix, generate_fem2d_csr
    from tpukk.sparse.gmres import GmresHandle, gmres

    sp = generate_fem2d_csr(900, seed=7).to_scipy().tocsr()
    sp = sp + 4.0 * __import__("scipy.sparse", fromlist=["eye"]).eye(
        sp.shape[0], format="csr")          # SPD-ish, well conditioned
    A = CsrMatrix.from_scipy(sp.astype(np.float32))
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(A.nrows).astype(np.float32))
    x_d, st_d = gmres(GmresHandle(m=40, tol=1e-6, reorder="none"), A, b)
    x_r, st_r = gmres(GmresHandle(m=40, tol=1e-6, reorder="rcm"), A, b)
    assert st_d.converged and st_r.converged
    r = sp @ np.asarray(x_r, np.float64) - np.asarray(b, np.float64)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-5
    np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_d),
                               rtol=2e-3, atol=2e-4)
