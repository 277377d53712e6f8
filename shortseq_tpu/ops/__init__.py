from .bitpack import (
    pack_words,
    unpack_ascii,
    validate,
    first_bad_byte,
    pack_and_validate,
    collapse_xor,
)
from .hamming import hamming_rows, hamming_pairwise
from .pallas_kernels import hamming_pairwise_tiled, pairwise_hamming_auto
