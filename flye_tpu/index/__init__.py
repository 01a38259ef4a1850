from flye_tpu.index.kmer_index import KmerIndex
