from flye_tpu.mapping.mapper import ReadMapper
