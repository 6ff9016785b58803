from esr_tpu.utils.util import (
    ProgressBar,
    get_timestamp,
    mkdir_and_rename,
    mkdirs,
    set_random_seed,
    setup_logger,
)
