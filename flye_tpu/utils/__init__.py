from flye_tpu.utils.logs import configure_logging, human_bytes
