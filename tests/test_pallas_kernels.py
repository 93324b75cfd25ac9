"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from epsilon_tpu.ops.pallas_kernels import (fused_local_update,
                                            local_update_reference)


def test_fused_local_update_matches_reference(rng):
    S, n = 4, 16
    A = rng.randn(S, 32, n)
    rho = 0.7
    AtA = np.einsum("smi,smj->sij", A, A)
    Finv = np.linalg.inv(AtA + rho * np.eye(n)).astype(np.float32)
    Atb = rng.randn(S, n).astype(np.float32)
    u = rng.randn(S, n).astype(np.float32)
    z = rng.randn(n).astype(np.float32)

    x_ref, xu_ref = local_update_reference(
        jnp.asarray(Finv), jnp.asarray(Atb), jnp.asarray(u), jnp.asarray(z),
        rho)
    x, xu = fused_local_update(
        jnp.asarray(Finv), jnp.asarray(Atb), jnp.asarray(u), jnp.asarray(z),
        rho, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xu_ref), atol=1e-4)


def test_fused_local_update_single_block(rng):
    S, n = 1, 8
    Finv = np.eye(n, dtype=np.float32)[None]
    Atb = rng.randn(S, n).astype(np.float32)
    u = np.zeros((S, n), dtype=np.float32)
    z = np.zeros(n, dtype=np.float32)
    x, xu = fused_local_update(jnp.asarray(Finv), jnp.asarray(Atb),
                               jnp.asarray(u), jnp.asarray(z), 1.0,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(x)[0], Atb[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(xu), Atb[0], atol=1e-6)
