from flye_tpu.polishing.matrices import get_subs_matrix
