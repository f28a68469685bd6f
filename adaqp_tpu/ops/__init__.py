from .quant import (  # noqa: F401
    BITS_SET,
    values_per_byte,
    pad_features,
    bytes_per_row,
    quantize_rows,
    dequantize_rows,
    pack_rows,
    unpack_rows,
    message_quantize,
    message_dequantize,
)
from .spmm import spmm_csr, segment_spmm  # noqa: F401
from .spmm_fast import ell_from_csr, spmm_ell  # noqa: F401
from .spmm_block import block_layout, spmm_block  # noqa: F401
