"""Batched general eigendecomposition example — KokkosBatched
Eigendecomposition analog (Hessenberg -> Schur -> er/ei + eigenvectors)."""
import jax.numpy as jnp
import numpy as np

from tpukk.batched import eig, eigendecomposition, schur


def main():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 6, 6))

    w, VL, VR = eig(jnp.asarray(A))
    res = max(np.linalg.norm(A[b] @ np.asarray(VR)[b][:, i]
                             - np.asarray(w)[b, i] * np.asarray(VR)[b][:, i])
              for b in range(4) for i in range(6))
    print(f"batched eig: max right-eigenpair residual = {res:.2e}")

    T, Z = schur(jnp.asarray(A[0]))
    print(f"schur: ||Z T Z^H - A|| = "
          f"{np.abs(np.asarray(Z) @ np.asarray(T) @ np.asarray(Z).conj().T - A[0]).max():.2e}")

    er, ei, UL, UR = eigendecomposition(jnp.asarray(A[:1]))
    print("er/ei (conjugate pairs adjacent):")
    for r, i in zip(np.asarray(er)[0], np.asarray(ei)[0]):
        print(f"  {r:+.4f} {i:+.4f}i")


if __name__ == "__main__":
    main()
