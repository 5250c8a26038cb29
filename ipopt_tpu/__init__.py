"""ipopt_tpu — a TPU-native (JAX/XLA/Pallas) large-scale NLP solver with the
capabilities of coin-or/Ipopt: primal-dual interior point with filter line
search, built from scratch for TPU hardware.

Quick start::

    import jax.numpy as jnp
    from ipopt_tpu import NLP, solve

    nlp = NLP(f=lambda x: jnp.sum(x**2), x0=jnp.array([1.0, 2.0]))
    result = solve(nlp)
"""

from .types import Iterate, SolverReturn, ApplicationReturnStatus
from .problem import NLP, CanonicalNLP, canonicalize
from .options import Options, print_options_documentation, parse_options_file
from .algorithm.solver import solve, SolveResult

__version__ = "0.1.0"

__all__ = [
    "NLP", "CanonicalNLP", "canonicalize", "Options", "solve", "SolveResult",
    "Iterate", "SolverReturn", "ApplicationReturnStatus",
    "print_options_documentation", "parse_options_file",
]
