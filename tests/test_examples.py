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
