"""Device kernels backing the [KERNEL] rows of SURVEY.md §2.

Everything here is pure, jittable, statically-shaped JAX — the compute-dense
replacements for the reference's per-point C++ loops and Ceres solves.
"""
