"""Scale-out: device meshes + data-parallel sharded renderers.

The reference is strictly single-GPU (SURVEY §2.7/§5.8 — its only
"communication backend" is cudaMemcpy).  This package is the genuinely new
TPU-native layer: rays shard over a `jax.sharding.Mesh` axis, scene /
network parameters / Q-tables replicate, and the cross-device reductions
(Q-table scatter contributions, DQN gradients, early-exit flags) ride ICI
as psum collectives inside shard_map.
"""

# Lazy exports (PEP 562): the submodules hold module-level jnp constants
# whose evaluation initialises the XLA backend, which must NOT happen
# before jax.distributed.initialize in a multi-process run — importing
# rlrpt_tpu.parallel (e.g. for .multihost) stays side-effect free.
_EXPORTS = {
    "make_mesh": "rlrpt_tpu.parallel.mesh",
    "ray_specs": "rlrpt_tpu.parallel.mesh",
    "render_default_dp": "rlrpt_tpu.parallel.dp",
    "render_frame_sarsa_dp": "rlrpt_tpu.parallel.dp",
    "render_frame_sarsa_wavefront_dp": "rlrpt_tpu.parallel.dp",
    "neural_q_train_step_dp": "rlrpt_tpu.parallel.dp",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
