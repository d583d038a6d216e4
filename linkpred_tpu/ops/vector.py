"""Vector primitives: gather/scatter/fill/copy/arithmetic over index sets.

Reference parity (`/root/reference/inc/_vector.hxx`): the seq+OMP pairs
``gatherValues[Omp]W`` (:42-148), ``scatterValues[Omp]W`` (:164-270),
``scatterOr`` (:285-329), ``valueIndicesW`` (:344-352), ``fillValue[Omp]U``
(:366-409), ``addValue`` (:423-463), ``copyValues`` (:478-518),
``multiplyValue(s)`` (:534-637).  Each hand-rolled OpenMP loop is one XLA op
here (functional: returns new arrays).  Scans/norms live in
`linkpred_tpu.ops.scan`.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "gather_values",
    "scatter_values",
    "scatter_or",
    "value_indices",
    "fill_value",
    "add_value",
    "copy_values",
    "multiply_value",
    "multiply_values",
]


def gather_values(x, ids):
    """``a[i] = x[ids[i]]`` (`_vector.hxx:42-148`)."""
    return x[ids]


def scatter_values(a, ids, x):
    """``a[ids[i]] = x[i]`` (`_vector.hxx:164-270`); duplicate ids keep an
    arbitrary writer, matching the reference's racy-but-benign OMP semantics."""
    return a.at[ids].set(x)


def scatter_or(a, ids, x):
    """``a[ids[i]] |= x[i]`` (`_vector.hxx:285-329`)."""
    return a.at[ids].max(x) if a.dtype == jnp.bool_ else a.at[ids].set(a[ids] | x)


def value_indices(x, n: int):
    """Inverse permutation-ish map: for each value v in x, record one index i
    with x[i] == v (`valueIndicesW`, `_vector.hxx:344-352`)."""
    return jnp.zeros((n,), dtype=jnp.int32).at[x].set(
        jnp.arange(x.shape[0], dtype=jnp.int32))


def fill_value(a, v, ids=None):
    """``a[:] = v`` or ``a[ids] = v`` (`fillValue[Omp]U`, `_vector.hxx:366-409`)."""
    if ids is None:
        return jnp.full_like(a, v)
    return a.at[ids].set(v)


def add_value(a, v, ids=None):
    """``a[...] += v`` (`addValue`, `_vector.hxx:423-463`)."""
    if ids is None:
        return a + v
    return a.at[ids].add(v)


def copy_values(x, ids=None):
    """Copy, optionally only at ``ids`` (`copyValues`, `_vector.hxx:478-518`)."""
    if ids is None:
        return jnp.array(x)
    return jnp.zeros_like(x).at[ids].set(x[ids])


def multiply_value(a, v, ids=None):
    """``a[...] *= v`` (`multiplyValue`, `_vector.hxx:534-585`)."""
    if ids is None:
        return a * v
    return a.at[ids].multiply(v)


def multiply_values(x, y):
    """Elementwise product (`multiplyValues`, `_vector.hxx:597-637`)."""
    return x * y
