from esr_tpu.cem.cemnet import CEM, CEMConf, make_cem
from esr_tpu.cem.kernels import bicubic_downsample_kernel_1d, downsample_kernel_2d
