"""Every example must run clean (reference registers examples as CTest
targets via examples/CMakeLists.txt)."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_runs(path):
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(path.parent.parent)}
    import os

    env = {**os.environ, **env}
    res = subprocess.run(
        [sys.executable, str(path)], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_plot_speeds_smoke(tmp_path):
    """bench/plot_speeds.py renders a PNG from bench JSON lines."""
    import json
    import subprocess
    import sys

    line = {"metric": "blosclz_shuffle_compress_device", "value": 9.2,
            "unit": "GB/s", "vs_baseline": 0.96,
            "details": {"clevel_sweep": {
                "1": {"compress_gbps": 7.2, "decompress_gbps": 1.6,
                      "ratio": 2.62},
                "5": {"compress_gbps": 9.2, "decompress_gbps": 4.9,
                      "ratio": 2.64}},
                "device_read_gbps": 707.0}}
    src = tmp_path / "bench.jsonl"
    src.write_text(json.dumps(line) + "\n")
    out = tmp_path / "speeds.png"
    r = subprocess.run(
        [sys.executable, "bench/plot_speeds.py", str(src), "-o", str(out)],
        cwd=pathlib.Path(__file__).parent.parent,
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr
    assert out.exists() and out.stat().st_size > 1000
