"""Ozaki int8-slice matmul (ops/omm.py): f64 accuracy gates."""

import jax.numpy as jnp
import numpy as np
import pytest

from laghos_tpu.ops import omm, ozaki


def _relerr(got, ref):
    den = np.maximum(np.abs(ref).max(axis=-1, keepdims=True), 1e-300)
    return np.max(np.abs(got - ref) / den)


def test_matmul_f64_accuracy():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(64, 27)))
    B = rng.normal(size=(27, 40))
    st = omm.split_static(B)
    got = np.asarray(omm.matmul(A, st))
    assert _relerr(got, np.asarray(A) @ B) < 1e-14


def test_matmul_wide_dynamic_range():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(128, 16))
                    * np.exp(rng.normal(size=(128, 16)) * 5))
    B = rng.normal(size=(16, 8)) * np.exp(rng.normal(size=(16, 8)) * 3)
    st = omm.split_static(B)
    got = np.asarray(omm.matmul(A, st))
    assert _relerr(got, np.asarray(A) @ B) < 1e-13


def test_power_of_two_boundary_no_overflow():
    """Row max within 0.4% below a power of two used to overflow slice 0
    (round(m * 2^Q) = 2^Q wraps int8)."""
    A = jnp.asarray(np.full((4, 9), 8191.9999))
    B = np.eye(9, 5)
    st = omm.split_static(B)
    got = np.asarray(omm.matmul(A, st))
    assert _relerr(got, np.asarray(A) @ B) < 1e-14
    # and the legacy one-shot entry point
    goz = np.asarray(ozaki.matmul_f64(A, jnp.asarray(B)))
    assert _relerr(goz, np.asarray(A) @ B) < 1e-14


def test_shared_dyn_split():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(32, 3, 27)))
    B1 = rng.normal(size=(27, 64))
    B2 = rng.normal(size=(27, 64))
    d = omm.split_dyn(A)
    g1 = np.asarray(omm.mm(d, omm.split_static(B1)))
    g2 = np.asarray(omm.mm(d, omm.split_static(B2)))
    assert _relerr(g1, np.asarray(A) @ B1) < 1e-14
    assert _relerr(g2, np.asarray(A) @ B2) < 1e-14


def test_zero_rows_and_columns():
    A = jnp.asarray(np.zeros((8, 12)))
    B = np.zeros((12, 6))
    B[0, 0] = 1.0
    st = omm.split_static(B)
    got = np.asarray(omm.matmul(A, st))
    np.testing.assert_array_equal(got, 0.0)


def test_static_zero_slices_dropped():
    # exact 7-bit values need only slice 0
    B = np.round(np.random.default_rng(3).normal(size=(5, 4)) * 32) / 64.0
    st = omm.split_static(B)
    assert len(st.slices) <= 2
