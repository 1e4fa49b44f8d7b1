"""TPU-native imaging operators (JAX/XLA/Pallas)."""
