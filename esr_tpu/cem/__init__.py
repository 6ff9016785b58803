from esr_tpu.cem.cemnet import CEM, CEMConf, make_cem
from esr_tpu.cem.kernels import bicubic_downsample_kernel_1d, downsample_kernel_2d

# Blind-SR kernel estimation (KernelGAN-style) lives in esr_tpu.cem.kernelgan;
# imported lazily by its CLI/tests (it pulls in optax/flax training deps).
