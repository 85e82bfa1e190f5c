"""Iterate every available codec (reference: examples/many_compressors.c)."""

import numpy as np

import cblosc_tpu as blosc

SIZE = 1000 * 1000


def main() -> None:
    src = np.arange(SIZE, dtype=np.int32).tobytes()
    print("Blosc version:", blosc.get_version_string())
    print("Compiled-in compressors:", ", ".join(blosc.list_compressors()))

    for name in blosc.list_compressors():
        code = blosc.set_compressor(name)
        libname, libver = blosc.get_complib_info(name)
        chunk = blosc.compress(9, blosc.SHUFFLE, 4, src)
        out = blosc.decompress(chunk)
        assert out == src
        print(f"Using {name} (codec {code}, {libname} {libver}): "
              f"{len(src)} -> {len(chunk)} ({len(src) / len(chunk):.1f}x)")


if __name__ == "__main__":
    main()
