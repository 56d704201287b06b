"""
Freeze the current errors as constants (cf. reference
``pisa/stages/utils/fix_error.py``): snapshots 'errors' at compute and
restores that snapshot at every apply.
"""

from __future__ import annotations

import numpy as np

from pisa_tpu.core.stage import Stage

__all__ = ["fix_error", "init_test"]


class fix_error(Stage):  # noqa: N801
    """No params."""

    def __init__(self, **std_kwargs):
        super().__init__(
            expected_params=(),
            expected_container_keys=("errors",),
            **std_kwargs,
        )

    def compute_function(self):
        for container in self.data:
            container["frozen_errors"] = container["errors"] * 1.0
            container.mark_changed("frozen_errors")

    def apply_function(self):
        for container in self.data:
            container["errors"] = container["frozen_errors"] * 1.0
            container.mark_changed("errors")


def init_test(**param_kwargs):
    """Instantiation example."""
    return fix_error()
