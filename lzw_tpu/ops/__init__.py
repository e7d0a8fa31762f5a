"""Core codec ops: scalar oracle, vectorized bit packing, jittable codecs."""
