"""Device-side (JAX/XLA/Pallas) compute kernels."""
