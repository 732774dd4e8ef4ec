from rlrpt_tpu.utils import image as image  # noqa: F401
from rlrpt_tpu.utils import stats as stats  # noqa: F401
