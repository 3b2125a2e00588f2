"""Recursive container/array conversions (reference ``common/thing.py`` —
whose ``thing2list`` references an undefined variable; fixed here).

"Things" are arbitrary nests of dict/list/tuple holding jax/numpy arrays
(and optionally torch tensors at the interop boundary)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _map(thing: Any, fn) -> Any:
    if isinstance(thing, dict):
        return type(thing)({k: _map(v, fn) for k, v in thing.items()})
    if isinstance(thing, (list, tuple)):
        return type(thing)(_map(v, fn) for v in thing)
    return fn(thing)


def thing2np(thing: Any) -> Any:
    def fn(v):
        if isinstance(v, jax.Array):
            return np.asarray(v)
        if "torch" in type(v).__module__:
            return v.detach().cpu().numpy()
        return v

    return _map(thing, fn)


def thing2jax(thing: Any) -> Any:
    def fn(v):
        if isinstance(v, np.ndarray):
            return jnp.asarray(v)
        if "torch" in type(v).__module__:
            return jnp.asarray(v.detach().cpu().numpy())
        return v

    return _map(thing, fn)


def thing2list(thing: Any) -> Any:
    def fn(v):
        if hasattr(v, "tolist"):
            return v.tolist()
        return v

    return _map(thing, fn)


def detach_thing(thing: Any) -> Any:
    """Stop gradients on every array leaf."""
    def fn(v):
        if isinstance(v, jax.Array):
            return jax.lax.stop_gradient(v)
        return v

    return _map(thing, fn)


def thing_to_dev(thing: Any, device) -> Any:
    def fn(v):
        if isinstance(v, (jax.Array, np.ndarray)):
            return jax.device_put(v, device)
        return v

    return _map(thing, fn)
