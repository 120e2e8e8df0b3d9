from rambl_tpu.utils.metrics import MetricsLogger  # noqa: F401
from rambl_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
