"""Audio IO and signal-processing components (host + JAX kernels)."""
