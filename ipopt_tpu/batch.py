"""Batched solves: thousands of independent NLPs in lockstep via vmap.

This replaces "run many Ipopt processes" (SURVEY.md §2.9): one jitted program
advances every instance of a structurally-identical NLP family simultaneously;
per-instance convergence is handled by masking — a finished lane's state is
frozen while the others continue, so the batch result is bit-identical to
solving each instance alone (test: ``tests/test_batch.py``).

Sharding: ``solve_batched`` accepts a ``jax.sharding.Mesh`` + axis name, in
which case the batch axis is sharded over devices with ``NamedSharding`` and
XLA handles the (trivially parallel) partitioning; convergence voting is a
collective-free reduction since each device owns whole instances.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Callable, Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .types import Iterate, SolverReturn
from .problem import NLP, CanonicalNLP, canonicalize
from .options import Options
from .algorithm.solver import (IPMState, ipm_step_with_resto, initial_state,
                               finalize, run_ipm, SolveResult)


def guarded_step(nlp: CanonicalNLP, opts: Options, st: IPMState) -> IPMState:
    """ipm_step that freezes finished lanes (vmap-safe masking)."""
    running = st.status == int(SolverReturn.CONTINUE)
    new = ipm_step_with_resto(nlp, opts, st)
    return jax.tree.map(lambda a, b: jnp.where(running, b, a), st, new)


def _run_batched(nlp_b: CanonicalNLP, opts: Options) -> IPMState:
    """vmapped while_loop: continue while any lane is running."""

    def one_init(nlp_i):
        return initial_state(nlp_i, opts)

    st = jax.vmap(one_init)(nlp_b)

    def cond(s: IPMState):
        return jnp.any(s.status == int(SolverReturn.CONTINUE))

    def body(s: IPMState):
        return jax.vmap(lambda n, x: guarded_step(n, opts, x))(nlp_b, s)

    return lax.while_loop(cond, body, st)


@partial(jax.jit, static_argnames=("opts",))
def _solve_batched_jit(nlp_b: CanonicalNLP, opts: Options) -> SolveResult:
    st = _run_batched(nlp_b, opts)
    return jax.vmap(lambda n, s: finalize(n, opts, s))(nlp_b, st)


def host_cpu_device():
    """The host CPU device when one is exposed alongside an accelerator
    (``jax_platforms="axon,cpu"``), else None.  Setup work — canonicalize,
    stacking — belongs on the host: on a tunneled accelerator every tiny
    eager op is a network round trip (512 canonicalizations cost ~500 s on
    the tunnel vs ~37 s on host CPU)."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def stack_problems(problems, options: Optional[Options] = None) -> CanonicalNLP:
    """Stack structurally identical canonical problems into one batched
    CanonicalNLP (leading batch axis on all array leaves).

    When a host CPU backend is available next to the accelerator, the
    per-problem canonicalization and the stacking run there (one transfer at
    solve time instead of thousands of eager accelerator ops)."""
    opts = options or Options()
    host = host_cpu_device()
    if host is not None:
        with jax.default_device(host):
            return _stack_problems_impl(problems, opts)
    return _stack_problems_impl(problems, opts)


def _stack_problems_impl(problems, opts: Options) -> CanonicalNLP:
    cs = [p if isinstance(p, CanonicalNLP) else canonicalize(p, opts)
          for p in problems]
    s0 = cs[0].struct
    for c in cs[1:]:
        if c.struct != s0:
            raise ValueError("batched problems must share structure "
                             "(same n/me/mi and index sets)")
    # The callables must be batch-invariant (same computation for every
    # instance; per-instance data flows through bounds / c_rhs / x0 arrays).
    # We therefore keep the first instance's f/g and stack only array leaves.
    first = cs[0]
    all_leaves = [jax.tree.flatten(c)[0] for c in cs]

    def on_accel(v):
        return isinstance(v, jax.Array) and any(
            d.platform != "cpu" for d in v.devices())

    # Host-resident leaves stack via numpy (no device round trips); leaves
    # already living on an accelerator keep the on-device jnp.stack path
    # (np.asarray there would be a device->host transfer per leaf).
    use_np = not any(on_accel(l) for ls in all_leaves for l in ls)
    if use_np:
        stacked = [np.stack([np.asarray(ls[i]) for ls in all_leaves])
                   for i in range(len(all_leaves[0]))]
    else:
        stacked = [jnp.stack([ls[i] for ls in all_leaves])
                   for i in range(len(all_leaves[0]))]
    return jax.tree.unflatten(jax.tree.structure(first), stacked)


def device_put_tree(tree, device=None):
    """Move every array leaf of a pytree onto ``device`` (default: the first
    accelerator device) in one transfer batch."""
    dev = device if device is not None else jax.devices()[0]
    return jax.tree.map(lambda x: jax.device_put(x, dev), tree)


def solve_batched(problem_batch, options: Optional[Options] = None,
                  mesh: Optional[jax.sharding.Mesh] = None,
                  axis: str = "batch", **option_kwargs) -> SolveResult:
    """Solve a batch of structurally identical NLPs in lockstep.

    ``problem_batch``: either a batched CanonicalNLP (from ``stack_problems``
    or a single canonical problem whose leaves carry a leading batch axis),
    or a list of NLP/CanonicalNLP instances.

    With ``mesh``, instances are sharded over ``mesh.axis_names`` axis ``axis``.
    """
    opts = options or Options()
    if option_kwargs:
        opts = opts.replace(**option_kwargs)
    opts = opts.replace(print_level=0)  # no per-lane logging in batch mode
    if isinstance(problem_batch, (list, tuple)):
        nlp_b = stack_problems(problem_batch, opts)
    else:
        nlp_b = problem_batch
    if mesh is not None:
        nlp_b = jax.tree.map(
            lambda x: jax.device_put(x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(
                    *( (axis,) + (None,) * (x.ndim - 1) )))),
            nlp_b)
    elif host_cpu_device() is not None:
        # Host-stacked batch: one bulk transfer onto the accelerator.
        nlp_b = device_put_tree(nlp_b)
    return _solve_batched_jit(nlp_b, opts)


def make_batched_family(family: Callable[..., NLP], params,
                        options: Optional[Options] = None) -> CanonicalNLP:
    """Build a batched problem from a parameterized family: ``family(theta)``
    must return an NLP of fixed structure for every leaf-row of ``params``.

    This is the MPC/OPF pattern: one symbolic problem, many parameter vectors.
    """
    opts = options or Options()
    rows = []
    leaves, treedef = jax.tree.flatten(params)
    nrows = leaves[0].shape[0]
    for i in range(nrows):
        theta = jax.tree.map(lambda p: p[i], params)
        rows.append(canonicalize(family(theta), opts))
    return stack_problems(rows, opts)
