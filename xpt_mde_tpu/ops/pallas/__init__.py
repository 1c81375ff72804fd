"""Pallas TPU kernels for the hot ops.

Each kernel has a jnp reference twin in xpt_mde_tpu/ops with identical
semantics; tests assert equivalence, and callers select via
``use_pallas`` flags (kernels require a real TPU; the CPU test platform
runs the interpreter or the jnp twin).
"""

from xpt_mde_tpu.ops.pallas.correlation import correlation_cost_pallas
