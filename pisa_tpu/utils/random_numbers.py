"""
Deterministic random-state handling (cf. reference
``pisa/utils/random_numbers.py:39``).
"""

import numpy as np

__all__ = ["get_random_state"]


def get_random_state(random_state=None, jumpahead=0):
    """Derive a ``numpy.random.RandomState`` from `random_state`, which may be
    None (non-deterministic), an int seed, a sequence of ints, or an existing
    RandomState (returned as-is). `jumpahead` advances a seeded state
    deterministically."""
    if random_state is None:
        return np.random.RandomState()
    if isinstance(random_state, np.random.RandomState):
        return random_state
    if isinstance(random_state, np.random.Generator):
        return random_state
    if isinstance(random_state, int):
        state = np.random.RandomState(random_state % (2**32))
    elif isinstance(random_state, (list, tuple, np.ndarray)):
        state = np.random.RandomState(np.asarray(random_state) % (2**32))
    else:
        raise TypeError(f"Cannot interpret random_state={random_state!r}")
    if jumpahead:
        state.rand(int(jumpahead))
    return state
