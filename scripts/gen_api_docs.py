#!/usr/bin/env python
"""Generate per-kernel API reference pages (docs/api/*.md) from the live
docstrings — the role of the reference's per-API Sphinx pages
(docs/source/API/sparse/, 25 sparse + 19 blas + 3 lapack + 3 graph pages).
Run after changing public APIs:  python scripts/gen_api_docs.py
"""
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "api")

# page -> (module, [symbols]); symbols resolve via getattr chains
PAGES = {
    "sparse/spmv": ("tpukk.sparse.spmv",
                    ["spmv", "spmm", "SpmvHandle", "SpmvAlgorithm"]),
    "sparse/spmv_struct": ("tpukk.sparse.spmv_struct",
                           ["spmv_struct", "structured_stencil_offsets"]),
    "sparse/spgemm": ("tpukk.sparse.spgemm",
                      ["spgemm", "spgemm_symbolic", "spgemm_numeric",
                       "spgemm_jacobi", "bspgemm", "SpgemmHandle",
                       "SpgemmAlgorithm"]),
    "sparse/spadd": ("tpukk.sparse.spadd",
                     ["spadd", "spadd_symbolic", "spadd_numeric",
                      "SpaddHandle"]),
    "sparse/gauss_seidel": ("tpukk.sparse.gauss_seidel",
                            ["gauss_seidel_symbolic", "gauss_seidel_numeric",
                             "gauss_seidel_apply", "GsHandle", "GsAlgorithm",
                             "ClusteringAlgorithm"]),
    "sparse/sptrsv": ("tpukk.sparse.sptrsv",
                      ["sptrsv_symbolic", "sptrsv_solve", "SptrsvHandle",
                       "SptrsvAlgorithm"]),
    "sparse/spiluk": ("tpukk.sparse.spiluk",
                      ["spiluk_symbolic", "spiluk_numeric", "SpilukHandle",
                       "build_iluk_refresh", "spiluk_refresh"]),
    "sparse/sptrsv_cholmod": ("tpukk.sparse.sptrsv_cholmod",
                              ["cholmod_import", "cholmod_raw_to_csr",
                               "CholmodSolve"]),
    "sparse/par_ilut": ("tpukk.sparse.par_ilut",
                        ["par_ilut", "ParIlutHandle"]),
    "sparse/gmres": ("tpukk.sparse.gmres",
                     ["gmres", "GmresHandle", "Ortho", "GmresStats"]),
    "sparse/pcg": ("tpukk.sparse.pcg", ["pcg", "pcg_iteration_body"]),
    "sparse/preconditioner": ("tpukk.sparse.preconditioner",
                              ["Preconditioner", "JacobiPrec", "LUPrec",
                               "MatrixPrec", "GsPrec", "IdentityPrec"]),
    "sparse/mdf": ("tpukk.sparse.mdf",
                   ["mdf_symbolic", "mdf_numeric", "mdf_ordering"]),
    "sparse/trsv": ("tpukk.sparse.trsv", ["trsv"]),
    "containers": ("tpukk.containers",
                   ["CsrMatrix", "BsrMatrix", "CooMatrix", "CcsMatrix",
                    "read_mtx", "write_mtx", "save_csr_npz", "load_csr_npz",
                    "generate_structured_laplacian", "generate_random_csr",
                    "generate_fem2d_csr"]),
    "blas/blas1": ("tpukk.blas.blas1", None),
    "blas/blas2": ("tpukk.blas.blas2", None),
    "blas/blas3": ("tpukk.blas.blas3", None),
    "lapack": ("tpukk.lapack", None),
    "batched/dense": ("tpukk.batched.dense", None),
    "batched/banded": ("tpukk.batched.banded", None),
    "batched/sparse": ("tpukk.batched.sparse", None),
    "batched/eig": ("tpukk.batched.eig", None),
    "graph/coloring": ("tpukk.graph.coloring",
                       ["graph_color", "graph_color_d2", "verify_coloring",
                        "color_sets", "ColoringAlgorithm"]),
    "graph/mis2": ("tpukk.graph.mis2",
                   ["graph_mis2", "graph_mis2_aggregate",
                    "graph_mis2_coarsen"]),
    "graph/coarsen": ("tpukk.graph.coarsen", None),
    "graph/ordering": ("tpukk.graph.ordering", None),
    "graph/triangle": ("tpukk.graph.triangle",
                       ["triangle_count", "triangle_count_per_row",
                        "build_triangle_plan", "triangle_count_device",
                        "TrianglePlan"]),
    "ode": ("tpukk.ode", None),
    "dist": ("tpukk.dist", None),
    "common/permute": ("tpukk.common.permute",
                       ["build_permute_plan", "static_permute",
                        "StaticPermutePlan"]),
    "sparse/spmv_ds": ("tpukk.sparse.spmv_pallas",
                       ["build_onehot_ds_plan", "onehot_spmv_ds",
                        "onehot_spmv_ds_planes", "DiaDsPlan", "dia_spmv_ds",
                        "ds_split_f64"]),
    "common/tracing": ("tpukk.common.tracing",
                       ["profile_region", "annotate", "trace", "region_name"]),
    "common/controls": ("tpukk.common.controls",
                        ["Controls", "print_configuration",
                         "eager_initialize"]),
    "handle": ("tpukk.handle", None),
}


def doc_symbol(name, obj):
    lines = []
    kind = "class" if inspect.isclass(obj) else "function"
    try:
        sig = str(inspect.signature(obj)) if not inspect.isclass(obj) else \
            str(inspect.signature(obj.__init__)).replace("(self, ", "(").replace("(self)", "()")
    except (ValueError, TypeError):
        sig = ""
    lines.append(f"### `{name}{sig}`\n")
    doc = inspect.getdoc(obj)
    if doc:
        lines.append(doc + "\n")
    if inspect.isclass(obj):
        if issubclass(obj, __import__("enum").Enum):
            lines.append("Values: " + ", ".join(f"`{m.name}`" for m in obj) + "\n")
        else:
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(m):
                    continue
                mdoc = inspect.getdoc(m)
                if not mdoc:
                    continue
                try:
                    msig = str(inspect.signature(m)).replace("(self, ", "(").replace("(self)", "()")
                except (ValueError, TypeError):
                    msig = ""
                lines.append(f"**`.{mname}{msig}`** — {mdoc.splitlines()[0]}\n")
    return "\n".join(lines)


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# tpukk API reference\n",
             "Generated from docstrings by `scripts/gen_api_docs.py` — the\n"
             "per-API page set mirroring the reference's Sphinx tree\n"
             "(`docs/source/API/`).  Reference-parity citations (file:line of\n"
             "kokkos-kernels) live in the docstrings themselves.\n"]
    npages = 0
    for page, (modname, symbols) in sorted(PAGES.items()):
        try:
            mod = importlib.import_module(modname)
        except Exception as e:
            print(f"skip {page}: {e}")
            continue
        if symbols is None:
            symbols = list(getattr(mod, "__all__", []))
        parts = [f"# {page}\n", f"Module `{modname}`.\n"]
        mdoc = inspect.getdoc(mod)
        if mdoc:
            parts.append(mdoc + "\n")
        for s in symbols:
            obj = getattr(mod, s, None)
            if obj is None:
                continue
            parts.append(doc_symbol(s, obj))
        path = os.path.join(OUT, page.replace("/", "_") + ".md")
        with open(path, "w") as f:
            f.write("\n".join(parts))
        index.append(f"- [{page}](api/{page.replace('/', '_')}.md)")
        npages += 1
    with open(os.path.join(OUT, "..", "API_INDEX.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {npages} pages + docs/API_INDEX.md")


if __name__ == "__main__":
    main()
