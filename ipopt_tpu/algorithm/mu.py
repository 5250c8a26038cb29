"""Barrier parameter strategies.

Reference parity:
- ``MonotoneMuUpdate`` (``src/Algorithm/IpMonotoneMuUpdate.cpp``): Fiacco-
  McCormick — once the barrier problem is solved to ``kappa_epsilon * mu``
  (kappa_epsilon = ``barrier_tol_factor``), update

      mu+ = max( min(kappa_mu * mu, mu^theta_mu), mu_min_bound )

  where mu_min_bound = min(tol, compl_inf_tol)/(barrier_tol_factor + 1) and
  mu_target; tau = max(tau_min, 1 - mu).  The decrease loop repeats while the
  new barrier problem is already converged (superlinear phase skips levels).
- ``AdaptiveMuUpdate`` + oracles (LOQO / probing / quality function) live in
  this module too (added incrementally).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..options import Options


class MuState(NamedTuple):
    mu: jnp.ndarray
    tau: jnp.ndarray


def mu_init_state(opts: Options, dtype) -> MuState:
    mu = jnp.asarray(opts.mu_init, dtype)
    tau = jnp.maximum(opts.tau_min, 1.0 - mu)
    return MuState(mu=mu, tau=tau)


def _new_mu_tau(mu, opts: Options):
    mu_min_bound = jnp.maximum(
        opts.mu_target,
        min(opts.tol, opts.compl_inf_tol) / (opts.barrier_tol_factor + 1.0))
    new_mu = jnp.maximum(
        jnp.minimum(opts.mu_linear_decrease_factor * mu,
                    mu ** opts.mu_superlinear_decrease_power),
        mu_min_bound)
    new_tau = jnp.maximum(opts.tau_min, 1.0 - new_mu)
    return new_mu, new_tau


def monotone_mu_update(opts: Options, ms: MuState, barrier_err) -> MuState:
    """One call per IPM iteration (IpIpoptAlg.cpp:368 UpdateBarrierParameter).

    ``barrier_err`` is E_mu at the current iterate for a *given* mu; the
    sub-problem is converged when E_mu <= kappa_epsilon * mu.  The decrease
    repeats (bounded loop) because after a superlinear decrease the new barrier
    problem may already be converged — matching the reference's inner while
    loop in MonotoneMuUpdate::UpdateBarrierParameter.

    Note: the reference re-evaluates E_mu for each trial mu.  E_mu depends on
    mu only through the complementarity block: E_mu = max(dual/s_d, primal,
    max_i |compl_i - mu|/s_c).  We receive a callable-free approximation: the
    caller passes a function of mu instead — to stay jit-friendly we pass the
    three components and recompute the max here.
    """
    raise NotImplementedError("use monotone_mu_update_components")


def monotone_mu_update_components(opts: Options, ms: MuState,
                                  dual_s, primal, compl_terms_max_fn) -> MuState:
    """dual_s: dual_inf/s_d; primal: primal_inf; compl_terms_max_fn(mu) ->
    max_i |slack_i * mult_i - mu| / s_c  as a jnp function of mu."""

    def err_for(mu):
        return jnp.maximum(jnp.maximum(dual_s, primal), compl_terms_max_fn(mu))

    def cond(carry):
        mu, tau, rounds = carry
        converged = err_for(mu) <= opts.barrier_tol_factor * mu
        new_mu, _ = _new_mu_tau(mu, opts)
        can_decrease = new_mu < mu
        return jnp.logical_and(jnp.logical_and(converged, can_decrease),
                               rounds < 30)

    def body(carry):
        mu, tau, rounds = carry
        new_mu, new_tau = _new_mu_tau(mu, opts)
        return new_mu, new_tau, rounds + 1

    mu, tau, _ = lax.while_loop(cond, body, (ms.mu, ms.tau, jnp.zeros((), jnp.int32)))
    return MuState(mu=mu, tau=tau)
