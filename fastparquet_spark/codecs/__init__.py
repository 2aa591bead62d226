"""Numpy-vectorized encoding kernels (no Spark dependency).

Each module round-trips bit-exactly against the semantics of the
reference kernels in ``fastparquet/cencoding.pyx`` (see per-function
citations), but is written for whole-column numpy/Arrow buffers so it
can run inside ``mapInArrow`` batch functions with no per-row Python.
"""

from fastparquet_spark.codecs.varint import (
    uvarint_encode,
    uvarint_decode,
    zigzag_encode,
    zigzag_decode,
    width_from_max_int,
)
from fastparquet_spark.codecs.bitpack import pack_bits, unpack_bits
from fastparquet_spark.codecs.rle import encode_hybrid, decode_hybrid
from fastparquet_spark.codecs.plain import (
    encode_plain,
    decode_plain,
    pack_byte_array,
    unpack_byte_array,
)
from fastparquet_spark.codecs.delta import delta_encode, delta_decode
from fastparquet_spark.codecs.dictionary import dict_build, dict_data_page, dict_decode_page
from fastparquet_spark.codecs.fsst import FsstTable, fsst_train, fsst_encode, fsst_decode
from fastparquet_spark.codecs.compression import compress, decompress, CODECS

__all__ = [
    "uvarint_encode", "uvarint_decode", "zigzag_encode", "zigzag_decode",
    "width_from_max_int", "pack_bits", "unpack_bits",
    "encode_hybrid", "decode_hybrid",
    "encode_plain", "decode_plain", "pack_byte_array", "unpack_byte_array",
    "delta_encode", "delta_decode",
    "dict_build", "dict_data_page", "dict_decode_page",
    "FsstTable", "fsst_train", "fsst_encode", "fsst_decode",
    "compress", "decompress", "CODECS",
]
