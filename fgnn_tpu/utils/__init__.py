from .logging import get_logger, log_config, log_test_result
from .timer import Timer, force_done
