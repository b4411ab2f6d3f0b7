from . import testing, time_checker
from .time_checker import TimeChecker, TimeCheckerManager, check_exec_time, device_time

__all__ = [
    "testing",
    "time_checker",
    "TimeChecker",
    "TimeCheckerManager",
    "check_exec_time",
    "device_time",
]
