from .fastq import (
    read_fastq_matrix,
    read_fastq_lines,
    read_fastq_seqs,
    fastq_line_index,
)
