"""True multi-process jax.distributed coverage (VERDICT r3 item 6).

Two OS processes, each with 2 virtual CPU devices, form one 4-device
global mesh via a localhost coordinator (parallel.multihost.initialize)
and render a sharded default frame; the assembled image must match the
same 4-device render done in ONE process bitwise (the sharded program is
deterministic given the key — per-device keys derive from axis_index,
which is identical in both layouts).
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from rlrpt_tpu.camera import Camera
from rlrpt_tpu.config import RenderConfig
from rlrpt_tpu.parallel.dp import render_default_dp
from rlrpt_tpu.parallel.mesh import make_mesh
from rlrpt_tpu.scene import cornell_box

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_render(tmp_path):
    port = _free_port()
    out = str(tmp_path / "assembled.npy")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # The container's sitecustomize registers the axon PJRT plugin (which
    # initialises an XLA backend before jax.distributed.initialize can
    # run) unless this is empty.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_REPO, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(i),
                               out],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"
    assembled = np.load(out)

    # Single-process reference on a 4-device mesh (same device count, same
    # axis indices -> identical threefry streams -> bitwise-equal image).
    mesh = make_mesh(devices=jax.devices()[:4])
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=2,
                       max_ray_bounces=4, ray_tile=256)
    img, _ = render_default_dp(jax.random.PRNGKey(0), cornell_box(),
                               Camera.create([0.0, 0.0, -3.0]), cfg,
                               mesh=mesh)
    np.testing.assert_allclose(assembled, np.asarray(img), rtol=0, atol=0)
