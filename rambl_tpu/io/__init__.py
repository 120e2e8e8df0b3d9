from rambl_tpu.io.fasta import (  # noqa: F401
    read_fasta,
    write_fasta,
    read_fastq,
    write_fastq,
)
from rambl_tpu.io.pack import (  # noqa: F401
    BASE_TO_CODE,
    CODE_TO_BASE,
    encode_seq,
    decode_seq,
    encode_batch,
    pack_2bit,
    unpack_2bit,
    revcomp_codes,
)
