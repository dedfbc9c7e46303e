from longqc_tpu.io.fastx import (  # noqa: F401
    guess_format, open_seq_chunk, parse_fastx_chunk, write_fastq,
    FORMAT_BAM, FORMAT_SAM, FORMAT_FASTQ, FORMAT_FASTA, FORMAT_FAST5,
    FORMAT_UNKNOWN,
)
from longqc_tpu.io.sampling import subsample_from_chunk  # noqa: F401
from longqc_tpu.io.stats import get_N50, get_NXX  # noqa: F401
