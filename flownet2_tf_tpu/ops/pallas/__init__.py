"""Pallas TPU kernels for the hot ops (correlation, flow warp).

Each kernel has a pure-jnp oracle in the parent package that defines the
numerics contract; parity is enforced by tests/test_*_pallas.py.
"""
