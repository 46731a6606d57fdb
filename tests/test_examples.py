"""Smoke-run example scripts end-to-end (VERDICT r1 item 9).

Each example is executed in a subprocess (its own JAX runtime, forced to
CPU the way conftest does — the JAX_PLATFORMS env var is ignored by this
install) with a temporary working directory so artifact files don't land
in the repo.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import jax
jax.config.update("jax_platforms", "cpu")
import runpy, sys
runpy.run_path(sys.argv[1], run_name="__main__")
"""


@pytest.mark.parametrize(
    "script,expect",
    [
        ("franke_2d.py", "max residual at sources"),
        ("isosurface_sphere.py", "540 vertices, 1076 facets"),
    ],
)
def test_example_runs(tmp_path, script, expect):
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, os.path.join(REPO, "examples", script)],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert expect in proc.stdout
