"""TPU device pipeline: filters, codec, chunk pipeline, host bridge.

Import cost matters for the byte-only API paths, so submodules are
imported lazily; ``from cblosc_tpu.tpu import filters`` etc. works as
usual.
"""

from __future__ import annotations

import importlib

__all__ = ["filters", "codec", "pipeline", "host_api"]


def __getattr__(name):
    if name in __all__:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
