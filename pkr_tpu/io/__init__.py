"""Kaldi interop: ark/scp codecs and the data-directory model."""

from pkr_tpu.io.kaldi_ark import (
    read_key,
    read_vec_int,
    write_vec_int,
    read_vec_flt,
    write_vec_flt,
    read_mat,
    write_mat,
    read_mat_ark,
    read_mat_scp,
    read_vec_flt_ark,
    read_vec_flt_scp,
    read_vec_int_ark,
    write_ark_scp,
    read_text_vec_ark,
    write_text_vec_ark,
    compress_matrix,
    decompress_matrix,
)
from pkr_tpu.io.datadir import DataDir

__all__ = [
    "read_key",
    "read_vec_int",
    "write_vec_int",
    "read_vec_flt",
    "write_vec_flt",
    "read_mat",
    "write_mat",
    "read_mat_ark",
    "read_mat_scp",
    "read_vec_flt_ark",
    "read_vec_flt_scp",
    "read_vec_int_ark",
    "write_ark_scp",
    "read_text_vec_ark",
    "write_text_vec_ark",
    "compress_matrix",
    "decompress_matrix",
    "DataDir",
]
