"""Pallas TPU kernels: the performance path of the codec.

Mosaic (the TPU Pallas backend) has no per-lane gather/scatter, and XLA-level
gathers measure ~100ns/element on this chip (see scripts/probe_tpu.py), so
every kernel here is built exclusively from operations the VPU executes at
line rate: elementwise ops, broadcasts, reductions, uniform dynamic slices
(row index shared by all lanes), and static rolls.  Dictionary state lives in
``[rows, 128]`` arrays with one lane per independent block; per-lane
"pointer" operations are reformulated as masked compare-scans and log-step
roll/select passes.
"""

# Kernel compiles through the dev relay take seconds to minutes; the
# persistent cache makes warm-process compiles sub-second.
from lzw_tpu.utils.cache import enable_compilation_cache as _ecc

_ecc()
del _ecc
