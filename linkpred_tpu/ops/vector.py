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

import jax
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
    """``a[ids[i]] |= x[i]`` (`_vector.hxx:285-329`).

    Duplicate ids OR-accumulate (the reference's atomic-free `|=` is idempotent
    and order-independent, so all writers contribute).  Bool uses scatter-max;
    integers sort by id and fold each run with a segmented OR scan — a plain
    gather-then-set would keep only one writer's bits per id.
    """
    if a.dtype == jnp.bool_:
        return a.at[ids].max(x)
    if ids.shape[0] == 0:  # concatenate below builds a (1,)-lane run marker
        return a
    order = jnp.argsort(ids)
    sid, sx = ids[order], x[order]
    neq = sid[1:] != sid[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])

    def comb(l, r):
        lf, lv = l
        rf, rv = r
        return lf | rf, jnp.where(rf, rv, lv | rv)

    _, acc = jax.lax.associative_scan(comb, (is_start, sx))
    # run-end lanes carry the full OR of their id's values; other lanes drop
    tgt = jnp.where(is_end, sid, a.shape[0])
    return a.at[tgt].set(a[sid] | acc, mode="drop")


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
