"""Spark wiring around the pure kernels: extraction stage, dedup,
similarity search, text stats, metrics, resume, IO."""
