"""Pure-Python document kernels. No Spark imports anywhere in this package —
kernels are deterministic functions bytes -> result, unit-tested without a JVM.
"""
