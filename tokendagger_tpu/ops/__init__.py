"""Device (JAX/XLA/Pallas) kernels for the tokenizer hot path."""
