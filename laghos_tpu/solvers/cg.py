"""Jitted preconditioned conjugate gradients, MFEM-faithful semantics.

Replaces mfem::CGSolver as configured by the reference
(laghos_solver.cpp:264-284): relative tolerance applies to the
preconditioned residual dot (r, Br) against its initial value, absolute
tolerance 0, zero initial guess.  The stopping rule and iteration counting
replicate MFEM's loop exactly so that CG iteration counts (part of the
reference's FOM, laghos_solver.cpp:722) and solution roundoff behavior
match.

TPU-first design: the loop is a `lax.while_loop`; multiple independent
right-hand sides (the velocity components, SURVEY §2.4.4) run batched in a
single loop with per-column convergence masks, turning dim scalar solves
into one wide solve without changing any per-column iterate.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray       # (C,) iterations used per column
    converged: jnp.ndarray   # (C,) bool


def cg(
    apply_A: Callable,               # (C, n) -> (C, n)
    b: jnp.ndarray,                  # (C, n)
    rel_tol: float,
    max_iter: int,
    precond: Optional[Callable] = None,   # (C, n) -> (C, n)
    dot: Optional[Callable] = None,       # (C,n),(C,n) -> (C,)
    x0: Optional[jnp.ndarray] = None,     # warm start (mfem
                                          # iterative_mode=true semantics;
                                          # the reference uses x0 = 0)
) -> CGResult:
    if dot is None:
        def dot(u, v):
            return jnp.sum(u * v, axis=-1)

    M = precond if precond is not None else (lambda r: r)

    if x0 is None:
        r = b
        x = jnp.zeros_like(b)
        z = M(r)
        d = z
        nom0 = dot(d, r)
        r0 = nom0 * (rel_tol * rel_tol)
    else:
        x = x0
        r = b - apply_A(x0)
        z = M(r)
        d = z
        nom0 = dot(d, r)
        # the convergence target stays referenced to b (what a cold-start
        # solve would use), so a warm start saves iterations instead of
        # silently solving to a tighter absolute tolerance
        zb = M(b)
        r0 = dot(zb, b) * (rel_tol * rel_tol)
    active0 = nom0 > r0
    Ad = apply_A(d)
    den = dot(d, Ad)

    def cond(state):
        x, r, d, Ad, nom, den, it, active, iters = state
        return jnp.logical_and(jnp.any(active), it <= max_iter)

    def body(state):
        x, r, d, Ad, nom, den, it, active, iters = state
        # Breakdown guard: an SPD operator gives den > 0; den <= 0 can
        # only be roundoff/underflow noise (observed with TPU double-float
        # f64 emulation on ~1e-30-scale residuals) — iterating further
        # amplifies garbage, so the column freezes at its current iterate
        # (mfem CGSolver prints "not positive definite" here).
        broke = jnp.logical_and(active, den <= 0.0)
        iters = jnp.where(broke, it, iters)
        active = jnp.logical_and(active, jnp.logical_not(broke))
        safe_den = jnp.where(den == 0.0, 1.0, den)
        alpha = nom / safe_den
        am = jnp.where(active, alpha, 0.0)[..., None]
        x = x + am * d
        r = r - am * Ad
        z = M(r)
        betanom = dot(r, z)
        just_conv = jnp.logical_and(active, betanom <= r0)
        iters = jnp.where(just_conv, it, iters)
        active = jnp.logical_and(active, jnp.logical_not(just_conv))
        beta = betanom / jnp.where(nom == 0.0, 1.0, nom)
        bm = jnp.where(active, beta, 0.0)[..., None]
        d = jnp.where(active[..., None], z + bm * d, d)
        Ad = jnp.where(active[..., None], apply_A(d), Ad)
        den = jnp.where(active, dot(d, Ad), den)
        nom = jnp.where(active, betanom, nom)
        return (x, r, d, Ad, nom, den, it + 1, active, iters)

    iters0 = jnp.where(active0, max_iter, 0)
    state = (x, r, d, Ad, nom0, den, jnp.asarray(1), active0, iters0)
    x, r, d, Ad, nom, den, it, active, iters = jax.lax.while_loop(
        cond, body, state)
    return CGResult(x, iters, jnp.logical_not(active))
