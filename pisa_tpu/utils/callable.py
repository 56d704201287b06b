"""
Serializable expression trees used by DerivedParams
(cf. reference ``pisa/utils/callable.py``: ``Funct``/``Var``/``OPS``).

A :class:`Var` is a named leaf; arithmetic on Vars/Functs builds a
:class:`Funct` tree that can be evaluated against a ``{name: value}`` mapping,
serialized to/from pure-python state, and traced by JAX (evaluation uses only
arithmetic and a whitelist of elementary functions).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Var", "Funct", "OPS"]

OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "pow": lambda a, b: a**b,
    "neg": lambda a: -a,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "exp": np.exp,
    "log": np.log,
    "sqrt": np.sqrt,
    "abs": abs,
}

_JAX_OPS = None


def _jax_ops():
    global _JAX_OPS
    if _JAX_OPS is None:
        import jax.numpy as jnp

        _JAX_OPS = dict(OPS)
        _JAX_OPS.update(
            sin=jnp.sin,
            cos=jnp.cos,
            tan=jnp.tan,
            exp=jnp.exp,
            log=jnp.log,
            sqrt=jnp.sqrt,
            abs=jnp.abs,
        )
    return _JAX_OPS


class _Node:
    """Shared arithmetic for Var/Funct/constants."""

    def _wrap(self, other):
        if isinstance(other, _Node):
            return other
        return Const(other)

    def __add__(self, other):
        return Funct("add", self, self._wrap(other))

    def __radd__(self, other):
        return Funct("add", self._wrap(other), self)

    def __sub__(self, other):
        return Funct("sub", self, self._wrap(other))

    def __rsub__(self, other):
        return Funct("sub", self._wrap(other), self)

    def __mul__(self, other):
        return Funct("mul", self, self._wrap(other))

    def __rmul__(self, other):
        return Funct("mul", self._wrap(other), self)

    def __truediv__(self, other):
        return Funct("div", self, self._wrap(other))

    def __rtruediv__(self, other):
        return Funct("div", self._wrap(other), self)

    def __pow__(self, other):
        return Funct("pow", self, self._wrap(other))

    def __neg__(self):
        return Funct("neg", self)

    # unary helpers
    def sin(self):
        return Funct("sin", self)

    def cos(self):
        return Funct("cos", self)

    def exp(self):
        return Funct("exp", self)

    def log(self):
        return Funct("log", self)

    def sqrt(self):
        return Funct("sqrt", self)


class Const(_Node):
    def __init__(self, value):
        self.value = float(value)

    def evaluate(self, env, use_jax=False):
        return self.value

    @property
    def depends(self):
        return set()

    @property
    def state(self):
        return {"type": "const", "value": self.value}

    def __repr__(self):
        return repr(self.value)


class Var(_Node):
    """Named leaf resolved from the evaluation environment."""

    def __init__(self, name):
        self.name = str(name)

    def evaluate(self, env, use_jax=False):
        return env[self.name]

    @property
    def depends(self):
        return {self.name}

    @property
    def state(self):
        return {"type": "var", "name": self.name}

    def __repr__(self):
        return self.name


class Funct(_Node):
    """Operator node over child nodes."""

    def __init__(self, op, *children):
        if op not in OPS:
            raise ValueError(f"Unknown op {op!r}; valid: {sorted(OPS)}")
        self.op = op
        self.children = tuple(children)

    def evaluate(self, env, use_jax=False):
        ops = _jax_ops() if use_jax else OPS
        args = [c.evaluate(env, use_jax=use_jax) for c in self.children]
        return ops[self.op](*args)

    __call__ = evaluate

    @property
    def depends(self):
        out = set()
        for c in self.children:
            out |= c.depends
        return out

    @property
    def state(self):
        return {
            "type": "funct",
            "op": self.op,
            "children": [c.state for c in self.children],
        }

    def __repr__(self):
        return f"{self.op}({', '.join(map(repr, self.children))})"


def node_from_state(state) -> _Node:
    t = state["type"]
    if t == "const":
        return Const(state["value"])
    if t == "var":
        return Var(state["name"])
    if t == "funct":
        return Funct(state["op"], *[node_from_state(c) for c in state["children"]])
    raise ValueError(f"Unknown node state {state!r}")


Funct.from_state = staticmethod(node_from_state)
