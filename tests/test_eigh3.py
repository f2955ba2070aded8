"""Closed-form 3x3 eigensolver vs numpy.linalg.eigh."""

import jax.numpy as jnp
import numpy as np

from vofod_tpu.ops.eigh3 import eigh3


class TestEigh3:
    def test_random_spd_batch(self, rng):
        X = rng.normal(size=(64, 5, 3)).astype(np.float64)
        A = np.einsum("bni,bnj->bij", X, X) + 1e-6 * np.eye(3)
        evals, evecs = eigh3(jnp.asarray(A, jnp.float64))
        evals, evecs = np.asarray(evals), np.asarray(evecs)
        want_vals = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(evals, want_vals, rtol=1e-4, atol=1e-5)
        # eigen equation + orthonormality
        for b in range(64):
            for k in range(3):
                v = evecs[b, :, k]
                np.testing.assert_allclose(
                    A[b] @ v, evals[b, k] * v, rtol=1e-3, atol=1e-3
                )
            np.testing.assert_allclose(
                evecs[b].T @ evecs[b], np.eye(3), atol=1e-4
            )

    def test_degenerate_isotropic(self):
        A = jnp.asarray(2.5 * np.eye(3)[None], jnp.float64)
        evals, evecs = eigh3(A)
        np.testing.assert_allclose(np.asarray(evals)[0], [2.5] * 3, rtol=1e-5)
        V = np.asarray(evecs)[0]
        np.testing.assert_allclose(V.T @ V, np.eye(3), atol=1e-5)

    def test_rod_covariance(self):
        # a rod along a random direction: major axis must align with it
        d = np.array([1.0, 2.0, -0.5])
        d /= np.linalg.norm(d)
        ts = np.linspace(-1, 1, 21)[:, None] * d[None, :]
        A = (ts.T @ ts / len(ts)) + 1e-9 * np.eye(3)
        evals, evecs = eigh3(jnp.asarray(A[None], jnp.float64))
        major = np.asarray(evecs)[0, :, 2]
        assert abs(abs(major @ d) - 1.0) < 1e-4
