"""Graph kernel tests — validity oracles (zero conflicts for coloring, cf.
kk_is_d1_coloring_valid usage in Test_Graph_graph_color.hpp:135-167;
exact triangle counts on known graphs)."""
import numpy as np
import pytest
import scipy.sparse as sps

from tpukk.containers import CsrMatrix, generate_random_csr, generate_structured_laplacian
from tpukk.graph import (
    ColoringAlgorithm,
    color_sets,
    coarsen,
    graph_color,
    graph_color_d2,
    graph_mis2,
    graph_mis2_aggregate,
    graph_mis2_coarsen,
    permute_matrix,
    rcb,
    rcm,
    triangle_count,
    triangle_count_per_row,
    verify_coloring,
)


def _sym(A):
    sp = A.to_scipy()
    sp = ((sp + sp.T) * 0.5).tocsr()
    sp.sort_indices()
    return CsrMatrix.from_scipy(sp.astype(np.float64))


@pytest.mark.parametrize("algo", [ColoringAlgorithm.SERIAL, ColoringAlgorithm.VB])
def test_d1_coloring_valid(algo):
    A = generate_structured_laplacian(20, 20)
    colors = graph_color(A, algo)
    assert verify_coloring(A, colors)
    # 2D Laplacian (bipartite 5-pt stencil) should need few colors
    assert colors.max() <= 8


@pytest.mark.parametrize("algo", [ColoringAlgorithm.SERIAL, ColoringAlgorithm.VB])
def test_d1_coloring_random(algo):
    A = _sym(generate_random_csr(120, 120, 5, seed=2))
    colors = graph_color(A, algo)
    assert verify_coloring(A, colors)


def test_d2_coloring():
    A = _sym(generate_random_csr(60, 60, 4, seed=3))
    colors = graph_color_d2(A)
    # distance-2 validity: no two vertices sharing a neighbor have same color
    sp = A.to_scipy()
    pat = sp.copy()
    pat.data[:] = 1.0
    sq = (pat @ pat.T + pat).tocsr()
    assert verify_coloring(CsrMatrix.from_scipy(sq.astype(np.float64)), colors)


def test_color_sets_partition():
    A = generate_structured_laplacian(10, 10)
    colors = graph_color(A)
    offsets, order = color_sets(colors)
    assert offsets[-1] == A.nrows
    assert len(np.unique(order)) == A.nrows
    for c in range(len(offsets) - 1):
        assert np.all(colors[order[offsets[c]:offsets[c + 1]]] == c + 1)


def test_mis2():
    A = generate_structured_laplacian(15, 15)
    roots = graph_mis2(A)
    sp = A.to_scipy()
    pat = sp.copy()
    pat.data[:] = 1.0
    A2 = (pat @ pat + pat).tocsr()
    sub = A2[roots][:, roots]
    off_diag = sub - sps.diags(sub.diagonal())
    assert np.abs(off_diag).sum() == 0  # pairwise distance > 2


def test_mis2_aggregate_and_coarsen():
    A = generate_structured_laplacian(12, 12)
    labels = graph_mis2_aggregate(A)
    assert labels.min() >= 0
    coarse, labels2 = graph_mis2_coarsen(A)
    assert coarse.nrows == int(labels2.max()) + 1
    assert coarse.nrows < A.nrows


def test_coarsen_heuristics():
    A = _sym(generate_random_csr(80, 80, 4, seed=4))
    for heur in ["mis2", "heavy_edge"]:
        from tpukk.graph import CoarsenHeuristic

        coarse, labels = coarsen(A, CoarsenHeuristic(heur))
        assert coarse.nrows == int(labels.max()) + 1
        assert coarse.nrows < A.nrows


def test_rcm_reduces_bandwidth():
    A = _sym(generate_random_csr(100, 100, 3, seed=5))
    perm = rcm(A)
    B = permute_matrix(A, perm)

    def bandwidth(sp):
        coo = sp.to_scipy().tocoo()
        return int(np.abs(coo.row - coo.col).max(initial=0))

    assert bandwidth(B) <= bandwidth(A)


def test_rcb_balanced():
    rng = np.random.default_rng(0)
    pts = rng.random((1000, 2))
    parts = rcb(pts, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.min() >= 200  # roughly balanced quarters


def test_triangle_count_known():
    # complete graph K4 has 4 triangles
    d = np.ones((4, 4)) - np.eye(4)
    A = CsrMatrix.from_scipy(sps.csr_matrix(d))
    assert triangle_count(A) == 4
    # 2D Laplacian 5-pt grid has no triangles
    L = generate_structured_laplacian(10, 10)
    assert triangle_count(L) == 0


def test_triangle_count_random_vs_dense():
    A = _sym(generate_random_csr(40, 40, 5, seed=6))
    d = (np.asarray(A.to_dense()) != 0).astype(np.int64)
    np.fill_diagonal(d, 0)
    d = ((d + d.T) > 0).astype(np.int64)
    expected = int(np.trace(d @ d @ d) // 6)
    assert triangle_count(A) == expected
    assert triangle_count_per_row(A).sum() == expected


def test_coloring_algorithm_variants(rng):
    """Distance1ColorHandle.hpp taxonomy: VBBIT/EB share VB's demotion set
    (identical colors); VBD/VBDBIT are the deterministic wavefront — a
    genuinely different algorithm (valid + repeat-run deterministic, color
    count usually <= VB's)."""
    from tpukk.containers import generate_structured_laplacian
    from tpukk.graph import ColoringAlgorithm, graph_color, verify_coloring

    A = generate_structured_laplacian(12, 12, dtype=np.float64)
    base = graph_color(A, ColoringAlgorithm.VB)
    for alg in [ColoringAlgorithm.VBBIT, ColoringAlgorithm.EB]:
        c = graph_color(A, alg)
        assert verify_coloring(A, c)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(base))
    for alg in [ColoringAlgorithm.VBD, ColoringAlgorithm.VBDBIT]:
        c = graph_color(A, alg)
        assert verify_coloring(A, c)
        np.testing.assert_array_equal(np.asarray(c),
                                      np.asarray(graph_color(A, alg)))


def test_vbd_wavefront_distinct_and_economical(rng):
    """VBD is not an alias: on random graphs the wavefront typically uses
    fewer colors than speculative VB (and never more than degree+1)."""
    from tpukk.graph import ColoringAlgorithm, graph_color, verify_coloring

    A = _sym(generate_random_csr(5000, 5000, 8, seed=13))
    cvb = graph_color(A, ColoringAlgorithm.VB)
    cvbd = graph_color(A, ColoringAlgorithm.VBD)
    assert verify_coloring(A, cvbd)
    deg = int(np.diff(A.host_row_map()).max())
    assert cvbd.max() <= deg + 1
    assert cvbd.max() <= cvb.max() + 1   # usually strictly fewer


def test_triangle_device_plan_matches_host(rng):
    """Device numeric masked-wedge count == the host C++ count; per-row and
    weighted variants (the TRIANGLE spgemm-mode numeric analog)."""
    import jax.numpy as jnp
    import scipy.sparse as sps
    from tpukk.graph.triangle import (build_triangle_plan,
                                      triangle_count_device)

    n = 300
    d = (rng.random((n, n)) < 0.04)
    d = np.triu(d, 1)
    sp = sps.csr_matrix((d + d.T).astype(np.float64))
    A = CsrMatrix.from_scipy(sp)
    plan = build_triangle_plan(A)
    total = int(np.asarray(triangle_count_device(plan)))
    assert total == triangle_count(A) == plan.num_triangles
    pr = np.asarray(triangle_count_device(plan, per_row=True))
    assert pr.sum() == total
    np.testing.assert_array_equal(
        pr.astype(np.int64), triangle_count_per_row(A))
    # weighted: unit weights reproduce the count; doubled edge weights
    # scale every triangle by 8
    nnzL = plan.ent.shape[0]
    w1 = jnp.ones(nnzL, jnp.float32)
    assert float(triangle_count_device(plan, values=w1)) == total
    assert float(triangle_count_device(plan, values=2 * w1)) == 8 * total


def test_native_rcm_matches_scipy_quality():
    """Native BFS RCM (tpukk_rcm) achieves scipy-level bandwidth on a
    scrambled banded matrix (graph/impl/KokkosGraph_BFS_impl.hpp:113 role)."""
    from tpukk import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    n = 30
    I = sps.identity(n)
    T = sps.diags([-1, 4, -1], [-1, 0, 1], (n, n))
    A = (sps.kron(I, T)
         + sps.diags([-1, -1], [-n, n], (n * n, n * n))).tocsr()
    rng = np.random.default_rng(7)
    q = rng.permutation(n * n)
    As = A[q][:, q].tocsr().astype(np.float32)
    perm = rcm(CsrMatrix.from_scipy(As))
    assert sorted(perm) == list(range(n * n))

    def bw(sp):
        coo = sp.tocoo()
        return int(np.abs(coo.row - coo.col).max(initial=0))

    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ps = reverse_cuthill_mckee(As, symmetric_mode=True)
    b_native = bw(As[perm][:, perm].tocsr())
    b_scipy = bw(As[ps][:, ps].tocsr())
    # parity with the scipy TPL within 1.5x (both find near-optimal bands)
    assert b_native <= max(b_scipy * 1.5, b_scipy + 4)


def test_d2_coloring_rectangular():
    """Rectangular D2 (rows sharing a column conflict) via the native
    forbidden-set sweep — no G² materialization."""
    B = sps.random(250, 180, 0.02, random_state=11,
                   format="csr").astype(np.float32)
    colors = graph_color_d2(CsrMatrix.from_scipy(B))
    assert (colors > 0).all()
    pat = B.copy()
    pat.data[:] = 1.0
    con = (pat @ pat.T).tocsr()
    for v in range(B.shape[0]):
        nbr = con.indices[con.indptr[v]:con.indptr[v + 1]]
        nbr = nbr[nbr != v]
        assert not (colors[nbr] == colors[v]).any()


def test_d2_coloring_large_no_square_blowup():
    """160k-vertex grid D2 colors in O(n) memory (the G²-free path); the
    color count stays near the theoretical 5-point-stencil D2 bound."""
    from tpukk import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    A = generate_structured_laplacian(400, 400)
    colors = graph_color_d2(A)
    sp = A.to_scipy()
    pat = sp.copy()
    pat.data[:] = 1.0
    sq = (pat @ pat.T + pat).tocsr()
    assert verify_coloring(CsrMatrix.from_scipy(sq.astype(np.float64)), colors)
    assert colors.max() <= 16


def test_d2_coloring_fallback_keeps_d1_edges(monkeypatch):
    """Scipy fallback (native unavailable) must keep distance-1 constraints:
    a path graph with no explicit diagonal previously lost them because
    pat@pat alone drops D1 edges (round-4 advisor finding)."""
    from tpukk import native

    monkeypatch.setattr(native, "d2_greedy_color",
                        lambda *a, **k: None)
    n = 6
    P = sps.diags([np.ones(n - 1), np.ones(n - 1)], [-1, 1],
                  (n, n)).tocsr().astype(np.float32)
    colors = graph_color_d2(CsrMatrix.from_scipy(P))
    pat = P.copy()
    pat.data[:] = 1.0
    sq = (pat @ pat.T + pat).tocsr()
    assert verify_coloring(CsrMatrix.from_scipy(sq.astype(np.float64)), colors)
