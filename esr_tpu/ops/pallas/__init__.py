"""Pallas TPU kernels for the hot ops.

The RRDB conv trunk is ~95% of inference time (docs/DESIGN.md); XLA's conv
emitter is the baseline, these kernels are the hand-tuned path. Import-guard
everything: kernels fall back to the XLA implementations off-TPU (tests run
them in interpreter mode on CPU)."""

from esr_tpu.ops.pallas.rdb_conv import fused_rdb5c
