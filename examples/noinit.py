"""Use the API without calling init() first (reference: examples/noinit.c
— blosc_compress auto-initializes, blosc.c:1318)."""

import numpy as np

import cblosc_tpu as blosc


def main() -> None:
    src = np.arange(250_000, dtype=np.int32).tobytes()
    # no blosc.init() on purpose
    chunk = blosc.compress(5, blosc.SHUFFLE, 4, src)
    out = blosc.decompress(chunk)
    assert out == src
    print(f"noinit roundtrip OK: {len(src)} -> {len(chunk)}")
    blosc.destroy()


if __name__ == "__main__":
    main()
