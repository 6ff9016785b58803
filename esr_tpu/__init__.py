"""esr_tpu — TPU-native Explorable Super Resolution framework.

A brand-new JAX / XLA / Pallas implementation of the capabilities of the
CVPR 2020 "Explorable Super Resolution" stack (reference:
YuvalBahat/Explorable-Super-Resolution_old, a BasicSR/ESRGAN-lineage PyTorch
codebase — see SURVEY.md for the structural analysis):

- ESRGAN-style 4x RRDB generator + VGG-style discriminator (flax, NHWC,
  bfloat16-friendly), trained with relativistic-adversarial + VGG-perceptual
  + range + map losses.
- CEM (Consistency Enforcing Module): an analytic projection guaranteeing the
  SR output downsamples exactly back to the LR input — implemented as a pure,
  jit-able on-device op.
- Spatial latent Z-map control channels and a jit-compiled test-time
  Z-optimization engine (imprint / variance / brightness / TV / periodicity
  objectives) with a headless exploration session API.
- jit-fused data preprocessing, shard_map data parallelism over an ICI mesh,
  and spatial (halo-exchange) sharding for large-image inference.

Layout mirrors the reference's layer map (SURVEY.md §1):
  options/  — config system      (ref: codes/options/)
  data/     — datasets+pipeline  (ref: codes/data/)
  models/   — nets, losses, trainers (ref: codes/models/)
  cem/      — consistency module (ref: codes/models/modules/CEM/)
  ops/      — resize, metrics, color, pallas kernels (ref: codes/data/util.py, codes/utils/util.py)
  explore/  — Z-optimization + session (ref: codes/Z_optimization.py, codes/GUI_SR.py)
  parallel/ — mesh / DP / spatial sharding (ref: nn.DataParallel — rebuilt TPU-first)
  utils/    — logging, misc      (ref: codes/utils/)
"""

__version__ = "0.1.0"
