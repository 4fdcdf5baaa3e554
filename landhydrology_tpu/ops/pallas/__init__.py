"""Pallas TPU kernels for the hot path."""

from landhydrology_tpu.ops.pallas.column_kernel import make_fused_column_run

__all__ = ["make_fused_column_run"]
