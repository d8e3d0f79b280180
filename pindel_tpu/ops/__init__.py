"""Search kernels: NumPy oracle (exact semantics) and JAX/Pallas TPU kernels."""
