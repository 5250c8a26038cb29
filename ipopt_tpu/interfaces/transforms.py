"""Problem-level transforms — NLPBoundsRemover / TNLPReducer equivalents.

- ``remove_bounds``: converts variable bounds into inequality constraint rows
  (reference ``NLPBoundsRemover``, src/Interfaces/IpNLPBoundsRemover.hpp:23 —
  required there by the inexact algorithm; here useful for the matrix-free
  mode and for experimentation).
- ``reduce_constraints``: drops a given set of constraint rows (reference
  ``TNLPReducer``, src/Interfaces/IpTNLPReducer.hpp:23).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..problem import NLP


def remove_bounds(nlp: NLP) -> NLP:
    """Return an equivalent NLP whose variable bounds are expressed as
    inequality rows x_i >= L / x_i <= U (the variable itself becomes free)."""
    x0 = np.asarray(nlp.x0, float)
    n = x0.shape[0]

    def fill(v, default):
        if v is None:
            return np.full((n,), default)
        return np.broadcast_to(np.asarray(v, float), (n,)).astype(float)

    x_L = fill(nlp.x_L, -np.inf)
    x_U = fill(nlp.x_U, np.inf)
    x_L = np.where(x_L <= -1e19, -np.inf, x_L)
    x_U = np.where(x_U >= 1e19, np.inf, x_U)
    bounded = np.isfinite(x_L) | np.isfinite(x_U)
    idx = np.nonzero(bounded)[0].astype(np.int32)
    if idx.size == 0:
        return nlp

    base_g = nlp.g
    parametric = nlp.params is not None

    if parametric:
        def g_new(x, p):
            rows = x[jnp.asarray(idx)]
            return rows if base_g is None else jnp.concatenate(
                [base_g(x, p), rows])
    else:
        def g_new(x):
            rows = x[jnp.asarray(idx)]
            return rows if base_g is None else jnp.concatenate(
                [base_g(x), rows])

    m_base = 0
    if base_g is not None:
        xs = jax.ShapeDtypeStruct((n,), jnp.float64)
        m_base = int((jax.eval_shape(base_g, xs, nlp.params)
                      if parametric else jax.eval_shape(base_g, xs)).shape[0])

    def fillg(v, default):
        if v is None:
            return np.full((m_base,), default)
        return np.broadcast_to(np.asarray(v, float), (m_base,)).astype(float)

    g_L = np.concatenate([fillg(nlp.g_L, -np.inf), x_L[idx]])
    g_U = np.concatenate([fillg(nlp.g_U, np.inf), x_U[idx]])
    return dataclasses.replace(nlp, g=g_new, g_L=g_L, g_U=g_U,
                               x_L=None, x_U=None,
                               name=nlp.name + "_boundsremoved")


def reduce_constraints(nlp: NLP, drop: Sequence[int]) -> NLP:
    """Return an NLP with the given constraint rows removed (TNLPReducer)."""
    if nlp.g is None:
        return nlp
    x0 = np.asarray(nlp.x0, float)
    n = x0.shape[0]
    parametric = nlp.params is not None
    xs = jax.ShapeDtypeStruct((n,), jnp.float64)
    m = int((jax.eval_shape(nlp.g, xs, nlp.params)
             if parametric else jax.eval_shape(nlp.g, xs)).shape[0])
    keep = np.array([i for i in range(m) if i not in set(drop)], np.int32)
    base_g = nlp.g

    if parametric:
        g_new = lambda x, p: base_g(x, p)[jnp.asarray(keep)]
    else:
        g_new = lambda x: base_g(x)[jnp.asarray(keep)]

    def pick(v, default):
        if v is None:
            return None
        arr = np.broadcast_to(np.asarray(v, float), (m,))
        return arr[keep]

    return dataclasses.replace(nlp, g=g_new,
                               g_L=pick(nlp.g_L, -np.inf),
                               g_U=pick(nlp.g_U, np.inf),
                               name=nlp.name + "_reduced")
