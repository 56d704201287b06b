"""
K-fold split selection (cf. reference ``pisa/stages/utils/kfold.py``):
zeroes the weights of all events outside the selected fold, optionally
renormalizing by the number of splits and saving the fold mask (consumed by
``likelihood.generalized_llh_params``).
"""

from __future__ import annotations

import numpy as np

from pisa_tpu import FTYPE
from pisa_tpu.core.stage import Stage

__all__ = ["kfold", "init_test"]


class kfold(Stage):  # noqa: N801
    """Parameters: n_splits, select_split, seed, renormalize, shuffle,
    save_mask."""

    def __init__(
        self,
        n_splits,
        select_split=0,
        seed=None,
        renormalize=False,
        shuffle=False,
        save_mask=False,
        **std_kwargs,
    ):
        super().__init__(
            expected_params=(),
            expected_container_keys=("weights",),
            supported_reps={"calc_mode": ["events"]},
            **std_kwargs,
        )
        self.n_splits = int(n_splits)
        self.select_split = int(select_split)
        self.seed = None if seed is None else int(seed)
        self.renormalize = bool(renormalize)
        self.shuffle = bool(shuffle)
        self.save_mask = save_mask

    def setup_function(self):
        from sklearn.model_selection import KFold

        kf = KFold(
            n_splits=self.n_splits, shuffle=self.shuffle,
            random_state=self.seed,
        )
        for container in self.data:
            dummy = np.zeros(container.size)
            for i, (_, test_index) in enumerate(kf.split(dummy)):
                if i == self.select_split:
                    select_idx = test_index
                    break
            fold = np.zeros(container.size, dtype=FTYPE)
            fold[select_idx] = self.n_splits if self.renormalize else 1.0
            container["fold_weight"] = fold
            container.mark_changed("fold_weight")
            if self.save_mask:
                mask = np.zeros(container.size, dtype=bool)
                mask[select_idx] = True
                container["kfold_mask"] = mask
                container.mark_changed("kfold_mask")

    def apply_function(self):
        for container in self.data:
            container["weights"] = (
                container["weights"] * container["fold_weight"]
            )


def init_test(**param_kwargs):
    """Instantiation example."""
    return kfold(n_splits=2, calc_mode="events")
