"""Scale-out: device meshes + data-parallel sharded renderers.

The reference is strictly single-GPU (SURVEY §2.7/§5.8 — its only
"communication backend" is cudaMemcpy).  This package is the genuinely new
TPU-native layer: rays shard over a `jax.sharding.Mesh` axis, scene /
network parameters / Q-tables replicate, and the cross-device reductions
(Q-table scatter contributions, DQN gradients, early-exit flags) ride ICI
as psum collectives inside shard_map.
"""

from rlrpt_tpu.parallel.mesh import make_mesh, ray_specs  # noqa: F401
from rlrpt_tpu.parallel.dp import (render_default_dp,  # noqa: F401
                                   render_frame_sarsa_dp,
                                   render_frame_sarsa_wavefront_dp,
                                   neural_q_train_step_dp)
