from esr_tpu.ops.resize import imresize, imresize_np, resize_matrix
from esr_tpu.ops.color import (
    rgb2ycbcr,
    bgr2ycbcr,
    ycbcr2rgb,
    tensor2img,
    img2tensor,
)
from esr_tpu.ops.metrics import calculate_psnr, calculate_ssim, psnr_jax, ssim_jax
