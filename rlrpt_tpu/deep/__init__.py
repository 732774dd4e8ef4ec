"""Deep-Q (neural network guided) path tracing — the TPU-native
re-design of the reference's deep_learning/ subsystem."""

from rlrpt_tpu.deep.neural_q import (NeuralQState, init_neural_q,
                                     render_frame_neural_q)  # noqa: F401
from rlrpt_tpu.deep.pretrained import render_frame_pretrained  # noqa: F401
