from srf_tpu.config.constants import Constants, ExitCode, Tag
from srf_tpu.config.logger import Logger, get_logger
from srf_tpu.config.options import ParseOption

__all__ = ["Constants", "ExitCode", "Tag", "Logger", "get_logger", "ParseOption"]
