"""List/dict/pytree algebra.

Covers the reference's ``common/ld_utils.py`` (ld2dl:75, cat_dl:31,
stack_dl:50, prefix_dict:12, unsort:22), ``common/torch_utils.py`` helpers
(nanmean:14, pad_tensor_list:39/unpad_vtensor:60, all_comb:96,
count_model_parameters:141) and ``common/list_utils.py`` chunking — in
numpy/JAX terms.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def ld2dl(list_of_dicts: List[dict]) -> Dict[str, list]:
    """[{k: v}, ...] -> {k: [v, ...]} (keys from the first element)."""
    if not list_of_dicts:
        return {}
    return {k: [d[k] for d in list_of_dicts] for k in list_of_dicts[0]}


def dl2ld(dict_of_lists: Dict[str, list]) -> List[dict]:
    keys = list(dict_of_lists)
    n = len(dict_of_lists[keys[0]])
    return [{k: dict_of_lists[k][i] for k in keys} for i in range(n)]


def cat_dl(dict_of_lists: Dict[str, list], axis: int = 0) -> dict:
    """Concatenate each list of arrays; non-arrays become flat lists."""
    out = {}
    for k, vals in dict_of_lists.items():
        if isinstance(vals[0], (np.ndarray, jnp.ndarray)):
            out[k] = np.concatenate([np.asarray(v) for v in vals], axis=axis)
        elif isinstance(vals[0], (list, tuple)):
            out[k] = [x for v in vals for x in v]
        else:
            out[k] = list(vals)
    return out


def stack_dl(dict_of_lists: Dict[str, list], axis: int = 0) -> dict:
    return {
        k: np.stack([np.asarray(v) for v in vals], axis=axis)
        if isinstance(vals[0], (np.ndarray, jnp.ndarray)) else list(vals)
        for k, vals in dict_of_lists.items()
    }


def prefix_dict(d: dict, prefix: str) -> dict:
    return {prefix + k: v for k, v in d.items()}


def unsort(ordered: Sequence, sort_idx: Sequence) -> list:
    """Undo a permutation: ordered[i] goes back to position sort_idx[i]."""
    out = [None] * len(ordered)
    for val, idx in zip(ordered, sort_idx):
        out[idx] = val
    return out


def chunks_by_len(lst: Sequence, n: int) -> List[list]:
    """Split into n chunks of ceil(len/n) (reference list_utils.py:4 — n is
    the chunk COUNT, not size)."""
    import math

    size = int(math.ceil(float(len(lst)) / n))
    return [list(lst[i:i + size]) for i in range(0, len(lst), size)]


def chunks_by_size(lst: Sequence, n: int) -> List[list]:
    """Split into chunks of size n (reference list_utils.py:13)."""
    return [list(lst[i:i + n]) for i in range(0, len(lst), n)]


def all_comb(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """All row combinations with features concatenated:
    (n_x, d_x) x (n_y, d_y) -> (n_x*n_y, d_x+d_y); 1-D inputs behave as
    d=1 index pairs (reference torch_utils.all_comb:96)."""
    x2 = x.reshape(x.shape[0], -1)
    y2 = y.reshape(y.shape[0], -1)
    nx, ny = x2.shape[0], y2.shape[0]
    xr = jnp.repeat(x2, ny, axis=0)
    yr = jnp.tile(y2, (nx, 1))
    out = jnp.concatenate([xr, yr], axis=1)
    if x.ndim == 1 and y.ndim == 1:
        return out  # (n_x*n_y, 2) index pairs
    return out


def nanmean(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    mask = jnp.isfinite(x)
    s = jnp.where(mask, x, 0.0).sum(axis=axis)
    n = mask.sum(axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def pad_tensor_list(tensors: List[np.ndarray]):
    """Ragged list of (Ni, ...) arrays -> padded (B, Nmax, ...) + lengths."""
    lens = np.asarray([len(t) for t in tensors])
    n_max = int(lens.max())
    out = np.zeros((len(tensors), n_max) + tuple(tensors[0].shape[1:]),
                   tensors[0].dtype)
    for i, t in enumerate(tensors):
        out[i, : len(t)] = t
    return out, lens


def unpad_vtensor(padded, lengths) -> List:
    """(B, Nmax, ...) + lengths -> ragged list."""
    return [np.asarray(padded[i][: int(n)]) for i, n in enumerate(lengths)]


def count_params(pytree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(pytree))
