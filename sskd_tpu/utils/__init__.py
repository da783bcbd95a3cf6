from sskd_tpu.utils.logging import get_logger, setup_logging
from sskd_tpu.utils.seed import new_rng, set_seed

__all__ = ["setup_logging", "get_logger", "set_seed", "new_rng"]
