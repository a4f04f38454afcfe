"""Low-precision axpy — parity with example/half/ (fp16 xpy): bf16 is the
TPU-native half type."""
import jax.numpy as jnp
import numpy as np

from tpukk import blas


def main():
    x = jnp.asarray(np.linspace(0, 1, 4096), jnp.bfloat16)
    y = jnp.asarray(np.linspace(1, 0, 4096), jnp.bfloat16)
    z = blas.axpy(2.0, x, y)
    print("bf16 axpy: z[0] =", float(z[0]), " z[-1] =", float(z[-1]),
          " dtype =", z.dtype)


if __name__ == "__main__":
    main()
