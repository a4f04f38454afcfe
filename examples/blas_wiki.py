"""BLAS wiki samples — parity with example/wiki/blas/ (abs, axpy, dot, fill,
iamax, mult, nrm1/2/inf, reciprocal, scal, update, gemv, gemm)."""
import numpy as np

from tpukk import blas


def main():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float32)
    y = rng.standard_normal(1000).astype(np.float32)

    print("abs  ->", float(blas.blas1.abs(x)[0]))
    print("axpy ->", float(blas.axpy(2.0, x, y)[0]))
    print("dot  ->", float(blas.dot(x, y)))
    print("fill ->", float(blas.fill(x, 3.0)[0]))
    print("iamax->", int(blas.iamax(x)))
    print("mult ->", float(blas.mult(1.0, y, 2.0, x, y)[0]))
    print("nrm1 =", float(blas.nrm1(x)), " nrm2 =", float(blas.nrm2(x)),
          " nrminf =", float(blas.nrminf(x)))
    print("reciprocal ->", float(blas.reciprocal(x)[0]))
    print("scal ->", float(blas.scal(0.5, x)[0]))
    print("update ->", float(blas.update(1.0, x, 2.0, y, 0.0, y)[0]))

    A = rng.standard_normal((64, 32)).astype(np.float32)
    v = rng.standard_normal(32).astype(np.float32)
    w = np.zeros(64, np.float32)
    print("gemv ->", float(blas.gemv("N", 1.0, A, v, 0.0, w)[0]))
    B = rng.standard_normal((32, 16)).astype(np.float32)
    C = np.zeros((64, 16), np.float32)
    print("gemm ->", float(blas.gemm("N", "N", 1.0, A, B, 0.0, C)[0, 0]))


if __name__ == "__main__":
    main()
