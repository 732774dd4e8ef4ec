from rlrpt_tpu.ops import hemisphere as hemisphere  # noqa: F401
from rlrpt_tpu.ops import linalg as linalg  # noqa: F401
