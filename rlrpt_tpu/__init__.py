"""rlrpt_tpu — a TPU-native reinforcement-learned path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
callumPearce/Reinforcement-Light-Rays-Pathtracer (mounted read-only at
/root/reference): Monte-Carlo path tracing with reinforcement-learned
importance sampling (Dahm & Keller, arXiv:1701.07403) in three flavours —

1. default uniform-hemisphere path tracing
   (ref: GPU_Rendering_Engine/Source/path_tracing/default_path_tracing.cu)
2. tabular expected-SARSA "radiance volume" guided tracing
   (ref: .../path_tracing/reinforcement_path_tracing.cu, .../radiance_volumes/)
3. deep-Q-network guided tracing with online training
   (ref: .../deep_learning/neural_q_pathtracer.cu, NN_Builders/)

Design stance (TPU-first, not a port):
  * the whole wavefront bounce loop lives inside one jitted program —
    SoA ray-state pytree + `lax.while_loop` with active masks; the
    reference's per-batch host<->device ping-pong (measured >100x slowdown,
    thesis 4_critical_evaluation.tex:283-285) does not exist here;
  * atomics are replaced by deterministic `segment_sum` scatter reductions;
  * the KD-tree nearest-volume query is replaced by a dense, matmul-shaped
    masked argmin (MXU-friendly) with identical normal-match semantics;
  * scaling is `jax.sharding.Mesh` + NamedSharding over the ray axis with
    psum gradient/Q-table reductions over ICI (parallel/).
"""

__version__ = "0.1.0"

from rlrpt_tpu import config as config  # noqa: F401
