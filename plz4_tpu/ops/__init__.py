"""Device compute kernels (JAX/XLA + Pallas) for the LZ4 block codec."""
