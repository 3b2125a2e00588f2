"""XDict: the framework-wide batch/prediction container.

A dict-of-arrays with collision-safe semantics, registered as a JAX pytree so
it can flow through ``jit`` / ``grad`` / ``shard_map`` unchanged. Mirrors the
behavioural contract of the reference container
(``/root/reference/common/xdict.py:26``): silent key overwrites are an error,
``merge`` requires disjoint key sets, and namespacing is done with
``prefix`` / ``postfix`` / ``replace_keys``. The tensor-conversion surface is
JAX-native (``to_np``, ``block_until_ready``) instead of torch ``.to(dev)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np


class XDict(dict):
    """Collision-safe string-keyed container for batches and predictions."""

    def __init__(self, mydict: Mapping[str, Any] | None = None):
        super().__init__()
        if mydict is not None:
            for k, v in mydict.items():
                super().__setitem__(k, v)

    # ------------------------------------------------------------------ keys
    def __setitem__(self, key: str, value: Any) -> None:
        if key in self:
            raise KeyError(
                f"XDict key '{key}' already exists; use overwrite() to replace it"
            )
        super().__setitem__(key, value)

    def overwrite(self, key: str, value: Any) -> None:
        """Replace an existing key (must already be present)."""
        if key not in self:
            raise KeyError(f"XDict overwrite of missing key '{key}'")
        super().__setitem__(key, value)

    def merge(self, other: Mapping[str, Any]) -> "XDict":
        """In-place union with *other*; key sets must be disjoint."""
        dup = set(self).intersection(other)
        if dup:
            raise KeyError(f"XDict merge key collision: {sorted(dup)}")
        for k, v in other.items():
            super().__setitem__(k, v)
        return self

    # ----------------------------------------------------------- namespacing
    def prefix(self, tag: str) -> "XDict":
        return XDict({tag + k: v for k, v in self.items()})

    def postfix(self, tag: str) -> "XDict":
        return XDict({k + tag: v for k, v in self.items()})

    def replace_keys(self, old: str, new: str) -> "XDict":
        return XDict({k.replace(old, new): v for k, v in self.items()})

    def search(self, keyword: str) -> "XDict":
        return XDict({k: v for k, v in self.items() if keyword in k})

    def rm(self, keyword: str, keep_list: Iterable[str] = ()) -> "XDict":
        keep = set(keep_list)
        return XDict(
            {k: v for k, v in self.items() if keyword not in k or k in keep}
        )

    # ------------------------------------------------------------- transforms
    def map(self, fn: Callable[[Any], Any]) -> "XDict":
        return XDict({k: fn(v) for k, v in self.items()})

    def mul(self, scalar: float) -> "XDict":
        return self.map(
            lambda v: v * scalar if isinstance(v, (jnp.ndarray, np.ndarray)) else v
        )

    def to_np(self) -> "XDict":
        def _np(v):
            if isinstance(v, jax.Array):
                return np.asarray(v)
            return v

        return self.map(_np)

    def to_jax(self) -> "XDict":
        def _jx(v):
            if isinstance(v, np.ndarray):
                return jnp.asarray(v)
            return v

        return self.map(_jx)

    def astype(self, dtype) -> "XDict":
        def _cast(v):
            if isinstance(v, (jnp.ndarray, np.ndarray)) and jnp.issubdtype(
                np.asarray(v).dtype, np.floating
            ):
                return v.astype(dtype)
            return v

        return self.map(_cast)

    # -------------------------------------------------------------- validation
    def has_invalid(self) -> bool:
        """True if any array holds NaN/Inf (host-side check; avoid inside jit)."""
        for k, v in self.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                arr = np.asarray(v)
                if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
                    return True
        return False

    def shapes(self) -> Dict[str, Any]:
        return {
            k: tuple(v.shape) if hasattr(v, "shape") else type(v).__name__
            for k, v in self.items()
        }

    def save(self, path, verbose: bool = False) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(dict(self.to_np()), f)
        if verbose:
            print(f"Saved XDict({len(self)} keys) to {path}")


def _xdict_flatten(xd: XDict):
    keys = sorted(xd.keys())
    return tuple(xd[k] for k in keys), tuple(keys)


def _xdict_unflatten(keys, children) -> XDict:
    out = XDict()
    for k, v in zip(keys, children):
        dict.__setitem__(out, k, v)
    return out


jax.tree_util.register_pytree_node(XDict, _xdict_flatten, _xdict_unflatten)


HOST_ONLY_KEYS = ("imgname", "num_valid", "dataset_name")


def device_view(meta: "XDict") -> "XDict":
    """Strip host-only bookkeeping keys (strings, python ints) before a
    batch enters a jitted step."""
    return XDict({k: v for k, v in meta.items() if k not in HOST_ONLY_KEYS})
