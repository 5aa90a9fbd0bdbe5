from soundscope_tpu.utils.io import DecodedAudio, DecodeError, decode_file, write_wav  # noqa: F401
from soundscope_tpu.utils.checkpoint import load_meter, save_meter  # noqa: F401
from soundscope_tpu.utils.metrics import GLOBAL as metrics, RTCounter, TickMonitor  # noqa: F401
