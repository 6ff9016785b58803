"""SURVEY.md §2 component-inventory audit: every reference component maps to
a concrete, importable implementation (the completeness contract this
framework is judged against)."""

import importlib

import pytest

INVENTORY = {
    # SURVEY §2.x -> (module, symbol)
    "2.1 train entry": ("esr_tpu.train", "main"),
    "2.2 test entry": ("esr_tpu.test", "main"),
    "2.2 eval loop (multi-Z draws)": ("esr_tpu.test", "evaluate_dataset"),
    "2.3 options parse": ("esr_tpu.options", "parse"),
    "2.3 NoneDict": ("esr_tpu.options", "NoneDict"),
    "2.3 check_resume": ("esr_tpu.options", "check_resume"),
    "2.4 LRHR dataset": ("esr_tpu.data", "LRHRDataset"),
    "2.4 LR dataset": ("esr_tpu.data", "LRDataset"),
    "2.4 loader factory": ("esr_tpu.data", "create_dataloader"),
    "2.4 fast random-access backend (LMDB-equiv)": ("esr_tpu.data.packed", "PackedDataset"),
    "2.5 MATLAB bicubic": ("esr_tpu.ops.resize", "imresize"),
    "2.5 host twin": ("esr_tpu.ops.resize", "imresize_np"),
    "2.5 modcrop/augment": ("esr_tpu.data.util", "modcrop"),
    "2.5 bgr2ycbcr": ("esr_tpu.ops.color", "bgr2ycbcr"),
    "2.6 define_G": ("esr_tpu.models.networks", "define_G"),
    "2.6 define_D": ("esr_tpu.models.networks", "define_D"),
    "2.6 define_F": ("esr_tpu.models.networks", "define_F"),
    "2.7 RRDBNet": ("esr_tpu.models.architecture", "RRDBNet"),
    "2.7 SRResNet family": ("esr_tpu.models.architecture", "SRResNet"),
    "2.7 Discriminator_VGG_128": ("esr_tpu.models.architecture", "DiscriminatorVGG128"),
    "2.7 VGG feature extractor": ("esr_tpu.models.architecture", "VGG19FeatureExtractor"),
    "2.8 RDB block": ("esr_tpu.models.blocks", "ResidualDenseBlock5C"),
    "2.8 RRDB block": ("esr_tpu.models.blocks", "RRDB"),
    "2.9 GAN loss": ("esr_tpu.models.losses", "gan_loss"),
    "2.9 RaGAN": ("esr_tpu.models.losses", "ragan_g_loss"),
    "2.9 gradient penalty": ("esr_tpu.models.losses", "gradient_penalty"),
    "2.9 range loss": ("esr_tpu.models.losses", "range_loss"),
    "2.9 map/structure loss": ("esr_tpu.models.losses", "map_loss"),
    "2.10 CEM": ("esr_tpu.cem", "CEM"),
    "2.10 kernel derivation": ("esr_tpu.cem.kernels", "bicubic_downsample_kernel_1d"),
    "2.11 base model": ("esr_tpu.models.base_model", "BaseModel"),
    "2.11 SRModel": ("esr_tpu.models.sr_model", "SRModel"),
    "2.11 SRRaGANModel": ("esr_tpu.models.srragan_model", "SRRaGANModel"),
    "2.11 factory": ("esr_tpu.models", "create_model"),
    "2.12 Z optimizer": ("esr_tpu.explore.z_optimizer", "ZOptimizer"),
    "2.12 objectives": ("esr_tpu.explore.objectives", "periodicity_objective"),
    "2.12 adversarial tool": ("esr_tpu.explore.objectives", "adversarial_objective"),
    "2.13 DP (DataParallel equiv)": ("esr_tpu.parallel.dp", "make_dp_train_step"),
    "2.14 PSNR": ("esr_tpu.ops.metrics", "calculate_psnr"),
    "2.14 SSIM": ("esr_tpu.ops.metrics", "calculate_ssim"),
    "2.14 tensor2img": ("esr_tpu.ops.color", "tensor2img"),
    "2.14 logger": ("esr_tpu.utils.logger", "Logger"),
    "2.14 ProgressBar": ("esr_tpu.utils.util", "ProgressBar"),
    "2.15 LR-pair script": ("esr_tpu.scripts.generate_mod_lr_bic", "main"),
    "2.15 subimage script": ("esr_tpu.scripts.extract_subimages", "main"),
    "2.15 pack script (LMDB-equiv)": ("esr_tpu.scripts.create_packed_dataset", "main"),
    "2.15 weight converter": ("esr_tpu.scripts.convert_torch_weights", "main"),
    "2.16 editor session": ("esr_tpu.explore.session", "ExplorationSession"),
    "2.16 editor view-model": ("esr_tpu.explore.viewmodel", "EditorViewModel"),
    "2.16 imprint text rasterizer": ("esr_tpu.explore.viewmodel", "render_text_mask"),
    "2.16 editor CLI": ("esr_tpu.explore.cli", "main"),
    "2.16 Qt GUI (gated)": ("esr_tpu.explore.gui", "launch"),
    "5.1 profiler": ("esr_tpu.utils.profiler", "trace"),
    "5.2 sanitizers": ("esr_tpu.utils.checks", "assert_finite"),
    "5.3 auto-resume": ("esr_tpu.models.base_model", "BaseModel"),
    "5.7 spatial parallelism": ("esr_tpu.parallel.spatial", "spatial_sharded_forward"),
    "5.7 tiled inference": ("esr_tpu.parallel.spatial", "tiled_forward"),
    "5.8 mesh": ("esr_tpu.parallel.mesh", "make_mesh"),
    "5.8 multi-host dryrun": ("esr_tpu.parallel.multihost", "run_dryrun_step"),
    "pallas hot-op kernel": ("esr_tpu.ops.pallas.rdb_conv", "fused_rdb5c"),
    "fused upsample rewrite": ("esr_tpu.ops.fused", "upsample2x_conv3x3"),
    "2.15 network interpolation (ESRGAN recipe)": ("esr_tpu.scripts.net_interp", "main"),
    "5.3 async checkpointing": ("esr_tpu.models.base_model", "BaseModel"),
    "perf: MXU-lane batch fold": ("esr_tpu.models.blocks", "fold_kernel"),
    "perf: spatial-fold batch-1 eval": ("esr_tpu.parallel.spatial", "spatial_fold_apply"),
    "2.10 kernel-opt resolver (inline/numpy/KernelGAN file)": ("esr_tpu.cem.kernels", "resolve_kernel"),
    "onboarding: one-command quickstart tour": ("esr_tpu.scripts.quickstart", "main"),
    "2.2 parity evaluator (driver metric #3)": ("esr_tpu.scripts.parity_eval", "run_parity_eval"),
    "5.5 device-side uint8 eval fetch": ("esr_tpu.ops.color", "to_uint8_jax"),
    "serving: AOT StableHLO export": ("esr_tpu.export", "export_servable"),
    "serving: model-code-free loader": ("esr_tpu.export", "load_servable"),
    "serving: export CLI": ("esr_tpu.scripts.export_model", "main"),
    "serving: HTTP daemon": ("esr_tpu.scripts.serve", "make_server"),
    "blind-SR: KernelGAN-style estimator": ("esr_tpu.cem.kernelgan", "estimate_kernel"),
    "blind-SR: estimator CLI": ("esr_tpu.scripts.estimate_kernel", "main"),
}


@pytest.mark.parametrize("label", sorted(INVENTORY))
def test_component_exists(label):
    module, symbol = INVENTORY[label]
    mod = importlib.import_module(module)
    assert hasattr(mod, symbol), f"{label}: {module}.{symbol} missing"
