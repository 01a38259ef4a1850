from flye_tpu.io.fasta import (
    read_seq_file,
    write_fasta,
    codes_to_str,
    str_to_codes,
)
from flye_tpu.io.seqstore import SeqId, SequenceStore
