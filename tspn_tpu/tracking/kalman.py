"""Batched constant-velocity Kalman filter for box tracking.

Functional, batched rebuild of the reference's per-track filter
(/root/reference/deep_sort/deep_sort/kalman_filter.py:23-229): the same
8-d state (x, y, a, h, vx, vy, va, vh) over (x, y, aspect, height)
observations, the same height-proportional noise scales and chi-square
gating table — but every operation acts on a (K, ...) stack of track
slots at once via jnp linear algebra, so a whole tracker's predict /
update / gate is three fused device ops instead of K Python calls.
"""

from __future__ import annotations

import jax.numpy as jnp

# 0.95 quantile of chi-square, N degrees of freedom (gating thresholds)
CHI2INV95 = {
    1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919,
}

_STD_WEIGHT_POSITION = 1.0 / 20
_STD_WEIGHT_VELOCITY = 1.0 / 160

# motion model F: position += velocity; observation H: first 4 dims
_F = jnp.eye(8) + jnp.eye(8, k=4)
_H = jnp.eye(4, 8)


def initiate(measurements: jnp.ndarray):
    """(K, 4) xyah measurements -> (means (K, 8), covs (K, 8, 8)).

    Velocities start at zero; standard deviations scale with box height
    (kalman_filter.py:56-85).
    """
    k = measurements.shape[0]
    mean = jnp.concatenate([measurements, jnp.zeros((k, 4))], axis=-1)
    h = measurements[:, 3]
    wp, wv = _STD_WEIGHT_POSITION, _STD_WEIGHT_VELOCITY
    std = jnp.stack([
        2 * wp * h, 2 * wp * h, jnp.full_like(h, 1e-2), 2 * wp * h,
        10 * wv * h, 10 * wv * h, jnp.full_like(h, 1e-5), 10 * wv * h,
    ], axis=-1)
    cov = jnp.einsum("ki,ij->kij", std**2, jnp.eye(8))
    return mean, cov


def _motion_cov(h: jnp.ndarray) -> jnp.ndarray:
    wp, wv = _STD_WEIGHT_POSITION, _STD_WEIGHT_VELOCITY
    std = jnp.stack([
        wp * h, wp * h, jnp.full_like(h, 1e-2), wp * h,
        wv * h, wv * h, jnp.full_like(h, 1e-5), wv * h,
    ], axis=-1)
    return jnp.einsum("ki,ij->kij", std**2, jnp.eye(8))


def predict(means: jnp.ndarray, covs: jnp.ndarray):
    """One constant-velocity step for all K tracks
    (kalman_filter.py:88-123)."""
    q = _motion_cov(means[:, 3])
    new_means = means @ _F.T
    new_covs = jnp.einsum("ij,kjl,ml->kim", _F, covs, _F) + q
    return new_means, new_covs


def project(means: jnp.ndarray, covs: jnp.ndarray):
    """State -> measurement space, adding observation noise
    (kalman_filter.py:125-152)."""
    wp = _STD_WEIGHT_POSITION
    h = means[:, 3]
    std = jnp.stack([wp * h, wp * h, jnp.full_like(h, 1e-1), wp * h], axis=-1)
    r = jnp.einsum("ki,ij->kij", std**2, jnp.eye(4))
    proj_means = means[:, :4]
    proj_covs = jnp.einsum("ij,kjl,ml->kim", _H, covs, _H) + r
    return proj_means, proj_covs


def update(means: jnp.ndarray, covs: jnp.ndarray, measurements: jnp.ndarray):
    """Measurement correction for all K tracks via batched Cholesky solve
    (kalman_filter.py:154-186)."""
    proj_means, proj_covs = project(means, covs)
    b = jnp.einsum("kij,lj->kil", covs, _H)  # (K, 8, 4) = P H^T
    # gain K = P H^T S^{-1}; solve S K^T = (P H^T)^T
    kt = jnp.linalg.solve(proj_covs, jnp.swapaxes(b, 1, 2))  # (K, 4, 8)
    gain = jnp.swapaxes(kt, 1, 2)  # (K, 8, 4)
    innovation = measurements - proj_means  # (K, 4)
    new_means = means + jnp.einsum("kij,kj->ki", gain, innovation)
    new_covs = covs - jnp.einsum("kij,kjl,kml->kim", gain, proj_covs, gain)
    return new_means, new_covs


def gating_distance(
    means: jnp.ndarray, covs: jnp.ndarray, measurements: jnp.ndarray
) -> jnp.ndarray:
    """Squared Mahalanobis distance of every measurement to every track.

    means (K, 8), covs (K, 8, 8), measurements (D, 4) -> (K, D).
    Matches kalman_filter.py:188-229 (full 4-dof gating).
    """
    proj_means, proj_covs = project(means, covs)
    chol = jnp.linalg.cholesky(proj_covs)  # (K, 4, 4)
    diff = measurements[None, :, :] - proj_means[:, None, :]  # (K, D, 4)
    # solve L z = d for each (track, det)
    z = jnp.linalg.solve(chol[:, None], diff[..., None])[..., 0]
    return jnp.sum(z * z, axis=-1)


def to_xyah(tlwh: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) top-left-width-height -> center-x, center-y, aspect, height."""
    x = tlwh[..., 0] + tlwh[..., 2] / 2
    y = tlwh[..., 1] + tlwh[..., 3] / 2
    a = tlwh[..., 2] / jnp.maximum(tlwh[..., 3], 1e-6)
    return jnp.stack([x, y, a, tlwh[..., 3]], axis=-1)


def to_tlwh(xyah: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) center-x, center-y, aspect, height -> tlwh."""
    h = xyah[..., 3]
    w = xyah[..., 2] * h
    return jnp.stack(
        [xyah[..., 0] - w / 2, xyah[..., 1] - h / 2, w, h], axis=-1
    )
