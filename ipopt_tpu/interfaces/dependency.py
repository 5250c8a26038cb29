"""Linearly-dependent equality-constraint detection.

Reference parity: ``TDependencyDetector`` / ``Ma28TDependencyDetector``
(``src/Algorithm/LinearSolvers/IpTDependencyDetector.hpp``,
``IpMa28TDependencyDetector.*``) as used by ``TNLPAdapter``
(``src/Interfaces/IpTNLPAdapter.cpp:628-700``): at the starting point, find
equality rows whose gradients are linearly dependent, report them, and take
them out of the constraint set (multipliers reset).  Option names preserved:
``dependency_detector`` (choices map to one TPU-native detector) and
``dependency_detection_with_rhs`` (append the residual so *inconsistent*
duplicates are kept and surface as infeasibility instead of being dropped).

TPU-native design: the detection is static setup (numpy, pre-trace) — a
modified-Gram-Schmidt rank filter over the equality-row gradients at x0, the
structural analog of the reference's symbolic LU on [I J^T; J 0].  O(me^2 n),
run once.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp


def detect_dependent_constraints(nlp, opts) -> List[int]:
    """Indices (user constraint numbering) of dependent equality rows at x0."""
    if nlp.g is None:
        return []
    x0 = jnp.asarray(np.asarray(nlp.x0, dtype=np.float64))

    if nlp.params is not None:
        g_fn = lambda x: nlp.g(x, nlp.params)
    else:
        g_fn = nlp.g
    g0 = np.asarray(g_fn(x0), dtype=np.float64)
    m = g0.shape[0]
    g_L = np.broadcast_to(np.asarray(
        nlp.g_L if nlp.g_L is not None else -np.inf, np.float64), (m,))
    g_U = np.broadcast_to(np.asarray(
        nlp.g_U if nlp.g_U is not None else np.inf, np.float64), (m,))
    eq = np.nonzero(g_L == g_U)[0]
    if eq.size <= 1:
        return []

    J = np.asarray(jax.jacfwd(g_fn)(x0), dtype=np.float64)[eq, :]
    rows = J
    if opts.dependency_detection_with_rhs:
        # Augment with the residual g(x0) - rhs: rows with equal gradients but
        # inconsistent right-hand sides stay independent (and the solver
        # reports infeasibility instead of silently dropping one).
        rows = np.concatenate([J, (g0[eq] - g_L[eq])[:, None]], axis=1)

    # Modified Gram-Schmidt rank filter: row i is dependent if its residual
    # after projection onto the previously accepted rows is tiny relative to
    # its own norm.
    eps = np.finfo(np.float64).eps
    tol = 1e4 * eps
    basis: List[np.ndarray] = []
    deps: List[int] = []
    for i in range(rows.shape[0]):
        v = rows[i].copy()
        nrm0 = np.linalg.norm(v)
        if nrm0 == 0.0:
            deps.append(int(eq[i]))  # zero gradient row: trivially dependent
            continue
        for b in basis:
            v -= np.dot(b, v) * b
        nrm = np.linalg.norm(v)
        if nrm <= tol * nrm0:
            deps.append(int(eq[i]))
        else:
            basis.append(v / nrm)
    return deps
