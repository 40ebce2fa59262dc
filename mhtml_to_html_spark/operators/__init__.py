"""DataFrame operators and their pure-Python single-archive kernels."""
