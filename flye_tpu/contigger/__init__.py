from flye_tpu.contigger.extender import generate_contigs, ContigInfo
