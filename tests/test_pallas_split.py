"""Gates for the fused Pallas Ozaki split (ops/pallas_split).

The kernel must produce a VALID split — self-consistent (slices, e)
reconstructing the operand to the n_slices truncation bound, int8-safe
— and plug into omm.mm unchanged.  Run in interpret mode (CPU test
box); on TPU the same code compiles through Mosaic.

Reference counterpart: the f64 contractions these splits feed replace
laghos_assembly.cpp:145-514.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from laghos_tpu.ops import omm, pallas_split


def _mixed_operand(shape, seed=0, spread=30):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal(shape) * np.exp2(
        rng.integers(-spread, spread, shape))
    return A


def _reconstruct(cat, e, S, ax, k):
    rec = 0.0
    for t in range(S):
        sl = jax.lax.slice_in_dim(cat, t * k, (t + 1) * k, axis=ax)
        rec = rec + sl.astype(jnp.float64) * 2.0 ** (-omm.Q * (t + 1))
    return rec * pallas_split.exact_pow2(e)


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("S", [8, 6, 4])
def test_split_reconstructs_within_bound(axis, S):
    A = jnp.asarray(_mixed_operand((3, 17, 33)))
    A = A.at[1, :, 5].set(0.0)          # all-zero rows stay safe
    cat, e = pallas_split.split_cat_pallas(A, S, axis, interpret=True,
                                           bc=16)
    k = A.shape[axis]
    rec = _reconstruct(cat, e, S, axis, k)
    mx = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    err = float(jnp.max(jnp.abs(rec - A) / jnp.maximum(mx, 1e-300)))
    assert err <= 2.0 ** (-omm.Q * S + 2)
    assert int(jnp.min(cat)) >= -128 and int(jnp.max(cat)) <= 127


def test_split_integer_exact():
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.integers(-1000, 1000, (4, 9, 8)).astype(float))
    cat, e = pallas_split.split_cat_pallas(B, 8, 1, interpret=True, bc=8)
    rec = _reconstruct(cat, e, 8, 1, 9)
    assert bool(jnp.all(rec == B))


def test_exact_pow2_is_exact():
    e = jnp.asarray(np.arange(-250, 251, dtype=np.float32))
    got = pallas_split.exact_pow2(e)
    want = jnp.asarray([float(2.0 ** int(x)) for x in np.asarray(e)])
    assert bool(jnp.all(got == want))


def test_mm_matches_xla_split():
    """omm.mm through a kernel-built DynSplit matches the XLA-split
    product to the shared truncation class."""
    rng = np.random.default_rng(5)
    A = jnp.asarray(rng.standard_normal((3, 17, 29)))
    B = rng.standard_normal((17, 12))
    st = omm.split_static(B, 8)
    ref = omm.mm(omm.split_dyn(A, 8, axis=1), st, axis=1)
    cat, e = pallas_split.split_cat_pallas(A, 8, 1, interpret=True,
                                           bc=16)
    k = 17
    slices = tuple(jax.lax.slice_in_dim(cat, t * k, (t + 1) * k, axis=1)
                   for t in range(8))
    dyn = omm.DynSplit(slices, pallas_split.exact_pow2(e), 8, cat)
    got = omm.mm(dyn, st, axis=1)
    exact = jnp.tensordot(A, jnp.asarray(B), axes=[[1], [0]])
    scale = float(jnp.max(jnp.abs(exact))) + 1e-300
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 1e-14
    assert float(jnp.max(jnp.abs(got - exact))) / scale < 1e-14
