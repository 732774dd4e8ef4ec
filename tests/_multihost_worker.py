"""Subprocess worker for the 2-process jax.distributed test.

Each process contributes 2 virtual CPU devices to a 4-device global mesh,
renders the same sharded default frame, and process 0 saves the assembled
image.  Run by tests/test_multihost.py; not a test itself.

Usage: python tests/_multihost_worker.py PORT PROCESS_ID OUT_NPY
"""

import os
import sys

port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from rlrpt_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()
assert jax.local_device_count() == 2

import numpy as np  # noqa: E402

from rlrpt_tpu.camera import Camera  # noqa: E402
from rlrpt_tpu.config import RenderConfig  # noqa: E402
from rlrpt_tpu.parallel.dp import render_default_dp  # noqa: E402
from rlrpt_tpu.scene import cornell_box  # noqa: E402

cfg = RenderConfig(width=16, height=16, samples_per_pixel=2,
                   max_ray_bounces=4, ray_tile=256)
scene = cornell_box()
cam = Camera.create([0.0, 0.0, -3.0])
img, aux = render_default_dp(jax.random.PRNGKey(0), scene, cam, cfg)
assembled = multihost.assemble_image(img)
assert assembled.shape == (16, 16, 3), assembled.shape
if pid == 0:
    np.save(out, assembled)
jax.distributed.shutdown()
