"""Fast Multipole Method force engines.

Engines (reference parity, SURVEY.md §2.2):
  * fmm3_kd / fmm2_kd — kd-tree FMM with dual-tree traversal, the
    production path (fmm_cart3_kdtree.cuh).  Dim-generic: the same engine
    covers 2D and 3D (equal-count splits along the widest axis).
"""

from coulomb_oscillators_tpu.ops.fmm.kdtree import KdFmmEngine, make_engine
