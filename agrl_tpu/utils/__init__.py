from agrl_tpu.utils.avgmeter import AverageMeter
from agrl_tpu.utils.iotools import (
    check_isfile,
    mkdir_if_missing,
    read_json,
    write_json,
)
from agrl_tpu.utils.logger import Logger
from agrl_tpu.utils.reidtools import calc_splits

__all__ = [
    "AverageMeter",
    "Logger",
    "calc_splits",
    "check_isfile",
    "mkdir_if_missing",
    "read_json",
    "write_json",
]
