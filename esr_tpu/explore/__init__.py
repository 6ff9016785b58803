from esr_tpu.explore.objectives import (
    Objective,
    adversarial_objective,
    brightness_objective,
    histogram_objective,
    imprint_objective,
    periodicity_objective,
    random_diverse_objective,
    tv_objective,
    variance_objective,
)
from esr_tpu.explore.z_optimizer import ZOptimizer, optimize_z
from esr_tpu.explore.session import ExplorationSession
from esr_tpu.explore.viewmodel import EditorViewModel
