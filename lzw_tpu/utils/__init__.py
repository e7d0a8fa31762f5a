"""Host-side utilities: corpora loading, metrics, profiling."""
