from soundscope_tpu.core import constants  # noqa: F401
from soundscope_tpu.core.config import MeterConfig  # noqa: F401
from soundscope_tpu.core.state import MeterState  # noqa: F401
