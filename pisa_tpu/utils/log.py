"""
Logging for pisa_tpu (cf. reference ``pisa/utils/log.py``): three loggers —
``logging`` (main), ``physics``, ``tprofile`` — and verbosity control.
"""

import logging as _logging
import sys

__all__ = ["logging", "physics", "tprofile", "set_verbosity"]

_FMT = "%(levelname)s %(message)s"

_LEVELS = {0: _logging.WARNING, 1: _logging.INFO, 2: _logging.DEBUG, 3: 5}

_logging.addLevelName(5, "TRACE")


def _make_logger(name):
    logger = _logging.getLogger(name)
    if not logger.handlers:
        handler = _logging.StreamHandler(sys.stderr)
        handler.setFormatter(_logging.Formatter(_FMT))
        logger.addHandler(handler)
        logger.propagate = False
    return logger


logging = _make_logger("pisa_tpu")
physics = _make_logger("pisa_tpu.physics")
tprofile = _make_logger("pisa_tpu.tprofile")


def trace(self, msg, *args, **kwargs):
    if self.isEnabledFor(5):
        self._log(5, msg, args, **kwargs)


for _lgr in (logging, physics, tprofile):
    _lgr.trace = trace.__get__(_lgr)


def set_verbosity(verbosity):
    """Set verbosity: 0=WARNING, 1=INFO, 2=DEBUG, 3=TRACE."""
    level = _LEVELS[min(int(verbosity), 3)]
    for lgr in (logging, physics, tprofile):
        lgr.setLevel(level)


set_verbosity(0)
