"""Hand-written Pallas TPU kernels for the dense-grid hot passes.

These are *alternative backends* to the XLA formulations in
:mod:`..ops` — every kernel here has an XLA twin and an exactness test
against it, mirroring the reference's CPU/CUDA/OpenCL
one-oracle-many-backends strategy (pointcloud_voxelization_test.cpp:275-295).
BASELINE.md records which backend wins per op on real v5e hardware; the
defaults in :mod:`..ops` follow those measurements.
"""

from . import edt_pallas  # noqa: F401
