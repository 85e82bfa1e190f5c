"""cblosc_tpu: a TPU-native blocking/shuffling/compression framework.

A from-scratch reimplementation of the capability set of Blosc/c-blosc
(reference: the c-blosc 1.21.7 C library) designed for TPU systems:

  * exact chunk-format compatibility (16-byte headers, bstarts offsets,
    split framing) with all six codecs: blosclz, lz4, lz4hc, snappy,
    zlib, zstd;
  * filters (byte-shuffle / bit-shuffle) as Pallas TPU kernels and a
    vectorized device compression pipeline (cblosc_tpu.tpu);
  * multi-chip scaling via jax.sharding over a block axis
    (cblosc_tpu.parallel) replacing the reference's pthread pool;
  * a native C++ host engine with a persistent thread pool
    (cblosc_tpu.native) plus a pure numpy oracle used for testing.
"""

from .api import *  # noqa: F401,F403
from .api import __all__ as _api_all
from .format import constants
from .format.constants import (  # noqa: F401
    ALWAYS_SPLIT, AUTO_SPLIT, BITSHUFFLE, BLOSCLZ, FORWARD_COMPAT_SPLIT,
    LZ4, LZ4HC, MAX_BUFFERSIZE, MAX_OVERHEAD, MAX_THREADS, MAX_TYPESIZE,
    NEVER_SPLIT, NOSHUFFLE, SHUFFLE, SNAPPY, VERSION_STRING, ZLIB, ZSTD,
)

__version__ = constants.VERSION_STRING
__all__ = list(_api_all) + ["constants"]
