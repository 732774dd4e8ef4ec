"""Headless drive of the SDL interactive viewer (tools/interactive.py —
the main.cu:42-89 presentation-loop equivalent, pygame dummy driver)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.parametrize("mode", ["default", "sarsa"])
def test_interactive_headless(tmp_path, mode):
    out = str(tmp_path / f"shot_{mode}.bmp")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               SDL_VIDEODRIVER="dummy")
    res = subprocess.run(
        [sys.executable, "-m", "rlrpt_tpu.tools.interactive",
         "--mode", mode, "--size", "48", "--spp", "1", "--bounces", "5",
         "--frames", "2", "--out", out],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    assert "frame 1" in res.stdout  # camera moved between frames, no recompile

    from rlrpt_tpu.utils.image import read_bmp
    img = read_bmp(out)
    assert img.shape == (48, 48, 3)
    assert img.max() > 0  # something rendered
