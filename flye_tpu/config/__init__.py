from flye_tpu.config.params import (
    Config,
    PIPELINE,
    setup_run_params,
)
