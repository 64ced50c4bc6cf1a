"""Scalar/vectorized function layer: tokenizer, posting codec, text stats."""
