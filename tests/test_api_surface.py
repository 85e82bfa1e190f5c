"""API-surface allowlist — the reference's exported-symbol check
(tests/check_symbols.py:10-64 runs nm against an allowlist; here the
package namespace is the ABI)."""

import cblosc_tpu


# blosc.h's 24 exported functions mapped to their Python names, plus the
# constant groups the header exposes (blosc.h:24-117) and submodules.
EXPECTED_FUNCTIONS = {
    "init", "destroy", "free_resources",
    "compress", "compress_ctx", "decompress", "decompress_ctx", "getitem",
    "set_nthreads", "get_nthreads",
    "set_compressor", "get_compressor",
    "set_blocksize", "get_blocksize",
    "set_splitmode", "get_splitmode",
    "compcode_to_compname", "compname_to_compcode", "list_compressors",
    "get_version_string", "get_complib_info",
    "cbuffer_sizes", "cbuffer_metainfo", "cbuffer_versions",
    "cbuffer_complib", "cbuffer_validate",
}

EXPECTED_CONSTANTS = {
    "NOSHUFFLE", "SHUFFLE", "BITSHUFFLE",
    "BLOSCLZ", "LZ4", "LZ4HC", "SNAPPY", "ZLIB", "ZSTD",
    "ALWAYS_SPLIT", "NEVER_SPLIT", "AUTO_SPLIT", "FORWARD_COMPAT_SPLIT",
    "MAX_OVERHEAD", "MAX_BUFFERSIZE", "MAX_TYPESIZE", "MAX_THREADS",
    "VERSION_STRING",
}

EXPECTED_OTHER = {
    "FormatError",                       # rich error type (python-idiomatic)
    # submodules (appear in dir() once anything imports them)
    "api", "constants", "core", "format", "models", "ops",
    "native", "parallel", "tpu", "utils",
}


def test_exported_surface_is_exactly_the_allowlist():
    names = {n for n in dir(cblosc_tpu) if not n.startswith("_")}
    allowed = EXPECTED_FUNCTIONS | EXPECTED_CONSTANTS | EXPECTED_OTHER
    unexpected = names - allowed
    missing = (EXPECTED_FUNCTIONS | EXPECTED_CONSTANTS) - names
    assert not unexpected, f"unexpected exports: {sorted(unexpected)}"
    assert not missing, f"missing exports: {sorted(missing)}"


def test_all_api_functions_callable():
    for name in EXPECTED_FUNCTIONS:
        assert callable(getattr(cblosc_tpu, name)), name
