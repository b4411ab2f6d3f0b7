from . import bimap, checkpoint, testing, time_checker
from .bimap import UnorderedBimap
from .time_checker import TimeChecker, TimeCheckerManager, check_exec_time, device_time

__all__ = [
    "bimap",
    "checkpoint",
    "testing",
    "time_checker",
    "TimeChecker",
    "TimeCheckerManager",
    "UnorderedBimap",
    "check_exec_time",
    "device_time",
]
