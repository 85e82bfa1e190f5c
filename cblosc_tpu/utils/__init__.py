"""Shared utilities: device timing + synthetic bench data (timing.py)."""

from .timing import chained, readback_latency, synth, sync_scalar  # noqa: F401
