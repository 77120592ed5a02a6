"""Integer-slice (Ozaki) f64 matmul: accuracy gates."""

import numpy as np
import jax.numpy as jnp

from laghos_tpu.ops import ozaki


def test_matmul_accuracy_full():
    # well-scaled operands (the FEM basis-table regime): full f64 accuracy
    rng = np.random.default_rng(0)
    A = rng.normal(size=(64, 48))
    B = rng.normal(size=(48, 80))
    C = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B), 8))
    Cref = A @ B
    scale = np.abs(A) @ np.abs(B)
    err = np.abs(C - Cref) / np.maximum(scale, 1e-300)
    assert err.max() < 1e-14


def test_matmul_theoretical_bound_wide_range():
    # wide intra-row dynamic range: error bounded by 2^-7S relative to the
    # row/col scale product (the documented guarantee)
    rng = np.random.default_rng(3)
    A = rng.normal(size=(32, 24)) * np.exp(rng.normal(size=(32, 24)) * 3)
    B = rng.normal(size=(24, 40)) * np.exp(rng.normal(size=(24, 40)) * 3)
    C = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B), 8))
    Cref = A @ B
    rowA = np.abs(A).max(axis=1, keepdims=True)
    colB = np.abs(B).max(axis=0, keepdims=True)
    bound = 256.0 * rowA * colB * 2.0 ** (-7 * 8)  # ~2^-48 guarantee
    assert np.all(np.abs(C - Cref) <= bound + 1e-300)


def test_matmul_accuracy_reduced():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(32, 27))
    B = rng.normal(size=(27, 64))
    C4 = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B), 4))
    Cref = A @ B
    scale = np.abs(A) @ np.abs(B)
    err4 = (np.abs(C4 - Cref) / np.maximum(scale, 1e-300)).max()
    assert err4 < 1e-7          # ~4 slices x 7 bits
    C8 = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B), 8))
    err8 = (np.abs(C8 - Cref) / np.maximum(scale, 1e-300)).max()
    assert err8 < 1e-14


def test_batched_shape():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(10, 6, 27))
    B = rng.normal(size=(27, 4))
    C = np.asarray(ozaki.matmul_f64_batched(jnp.asarray(A), jnp.asarray(B)))
    assert C.shape == (10, 6, 4)
    np.testing.assert_allclose(C, A @ B, rtol=0, atol=1e-12)
