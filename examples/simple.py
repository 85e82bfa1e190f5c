"""Minimal compress/decompress roundtrip (reference: examples/simple.c).

Compresses 1M float32 values (a smooth ramp, the reference's i/(i+1)
pattern) with clevel 5 + shuffle and verifies the roundtrip.
"""

import numpy as np

import cblosc_tpu as blosc

SIZE = 1000 * 1000


def main() -> None:
    i = np.arange(SIZE, dtype=np.float32)
    data = (i + i / (i + 1.0)).astype(np.float32)
    src = data.tobytes()

    print(f"Blosc version info: {blosc.get_version_string()}")

    chunk = blosc.compress(5, blosc.SHUFFLE, 4, src)
    if not chunk:
        raise SystemExit("Compression error. Destination size too small?")
    print(f"Compression: {len(src)} -> {len(chunk)} "
          f"({len(src) / len(chunk):.1f}x)")

    out = blosc.decompress(chunk)
    assert out == src
    print("Successful roundtrip!")


if __name__ == "__main__":
    main()
