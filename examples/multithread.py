"""Worker-parallel compression sweep (reference: examples/multithread.c).

Sweeps the engine's internal parallelism 1..4 over the same buffer. In
this framework "threads" drive the native C++ engine's pool (the numpy
engine maps them to a thread pool; the TPU engine is data-parallel by
construction and ignores the knob).
"""

import time

import numpy as np

import cblosc_tpu as blosc

SIZE = 4_000_000


def main() -> None:
    rng = np.random.default_rng(42)
    data = (rng.integers(0, 1 << 19, SIZE // 4, dtype=np.int32) << 13)
    src = data.tobytes()

    blosc.set_compressor("blosclz")
    for nthreads in range(1, 5):
        blosc.set_nthreads(nthreads)
        t0 = time.perf_counter()
        chunk = blosc.compress(9, blosc.SHUFFLE, 4, src)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = blosc.decompress(chunk)
        td = time.perf_counter() - t0
        assert out == src
        print(f"nthreads={nthreads}: ratio {len(src) / len(chunk):5.1f}x  "
              f"compress {len(src) / tc / 1e9:5.2f} GB/s  "
              f"decompress {len(src) / td / 1e9:5.2f} GB/s")


if __name__ == "__main__":
    main()
