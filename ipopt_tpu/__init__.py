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
from .batch import solve_batched, stack_problems
from .chained import ChainedNLP, canonicalize_chained
from .parallel.scenario import ScenarioNLP, canonicalize_scenario
from .deriv_check import check_derivatives
from . import sens
from . import modellib

__version__ = "0.1.0"

__all__ = [
    "NLP", "CanonicalNLP", "canonicalize", "Options", "solve", "SolveResult",
    "Iterate", "SolverReturn", "ApplicationReturnStatus",
    "print_options_documentation", "parse_options_file",
    "solve_batched", "stack_problems",
    "ChainedNLP", "canonicalize_chained",
    "ScenarioNLP", "canonicalize_scenario",
    "check_derivatives", "sens", "modellib",
]
