"""Pallas (Mosaic) TPU kernels — the native tier of the framework.

`elementwise`: fused whole-chain forward+ladj, fused backward, and the
single-pass negll train-step kernel, all on the packed batch layout.

Chained-Householder VMEM scan kernels were considered and deliberately NOT
built: for every realistic event dim (d <= 1024) collapsing the reflection
chain into one orthogonal Q and hitting the MXU (bijectors.householder
dense path; block-diagonal form inside the fused kernel) strictly
dominates — Q is batch-independent and a (d, d) matmul is cheaper than k
sequential VPU sweeps. A VMEM scan kernel only wins when Q itself no
longer fits on-chip (d >~ 4096), far beyond the BASELINE.json configs.
"""
from .elementwise import (
    fused_forward_and_ladj,
    fused_forward_and_ladj_packed,
    fused_negll_value_and_grad,
    is_fusible_chain,
)
from .coupling import (
    fused_coupling_forward_and_ladj,
    is_fusible_coupling_stack,
)

__all__ = [
    "fused_forward_and_ladj", "fused_forward_and_ladj_packed",
    "fused_negll_value_and_grad", "is_fusible_chain",
    "fused_coupling_forward_and_ladj", "is_fusible_coupling_stack",
]
