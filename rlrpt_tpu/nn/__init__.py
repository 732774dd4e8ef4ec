from rlrpt_tpu.nn.dq_network import DQNetworkParams, dq_apply, dq_init  # noqa: F401
from rlrpt_tpu.nn.encoding import relative_vertex_encoding  # noqa: F401
