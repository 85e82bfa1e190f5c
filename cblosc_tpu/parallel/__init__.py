"""Multi-device (ICI/DCN) parallel engine."""

from .engine import (  # noqa: F401
    BLOCKS,
    compress_blocks_sharded,
    decompress_blocks_sharded,
    make_mesh,
    training_step,
)
