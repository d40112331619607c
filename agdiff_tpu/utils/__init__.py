from agdiff_tpu.utils.logging import get_logger, get_new_log_dir, MetricsWriter  # noqa: F401
from agdiff_tpu.utils.misc import BlackHole, seed_all, inf_iterator  # noqa: F401
