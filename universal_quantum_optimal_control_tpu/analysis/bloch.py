r"""Bloch-sphere ensemble evolution — simulation + animation (qutip-free).

The reference animates per-disorder-sample |ψ⟩ trajectories on a
``qutip.Bloch`` sphere (visualize/util.py:427-519).  qutip is not in this
image; the sphere is drawn directly with matplotlib 3D.  The state evolution
itself is quaternion algebra: the Bloch vector of ``U|0⟩`` is the rotated
z-axis ``R(q)·ẑ``, where R is the SO(3) matrix of the propagator quaternion —
no complex spinors needed (verified against spinor simulation in tests).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import su2
from ..core.propagate import propagate_scan

__all__ = ["quat_rotation_matrix", "bloch_trajectories",
           "spinor_to_bloch", "animate_bloch_ensemble"]


def quat_rotation_matrix(q: jax.Array) -> jax.Array:
    """SO(3) rotation matrix of ``U(q) · U(q)†`` conjugation: ``(..., 3, 3)``.

    For U = exp(−iθ/2 n·σ), conjugation rotates Bloch vectors by θ about n —
    the standard unit-quaternion rotation matrix.
    """
    w, x, y, z = (q[..., i] for i in range(4))
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return r


def spinor_to_bloch(psi: jax.Array) -> jax.Array:
    """``(..., 2)`` complex spinors → ``(..., 3)`` Bloch vectors
    (reference visualize_universal_with_pipeline.py:22-29)."""
    a, b = psi[..., 0], psi[..., 1]
    sx = 2 * jnp.real(jnp.conj(a) * b)
    sy = 2 * jnp.imag(jnp.conj(a) * b)
    sz = jnp.abs(a) ** 2 - jnp.abs(b) ** 2
    return jnp.stack([sx, sy, sz], axis=-1)


@jax.jit
def _trajectories(pulses, delta, eps, r0):
    """Cumulative per-segment Bloch vectors: (S, L+1, 3) for S samples."""
    L = pulses.shape[0]

    def body(carry_q, k):
        seg = su2.segment_quat(pulses[k, 0], pulses[k, 1], delta, eps)
        q = su2.quat_multiply(seg, carry_q)
        return q, q

    init = jnp.zeros(delta.shape + (4,)).at[..., 0].set(1.0)
    _, qs = jax.lax.scan(body, init, jnp.arange(L))  # (L, S, 4)
    qs = jnp.concatenate([init[None], qs], axis=0)   # (L+1, S, 4)
    r = jnp.einsum("lsij,j->lsi", quat_rotation_matrix(qs), r0)
    return jnp.swapaxes(r, 0, 1)  # (S, L+1, 3)


def bloch_trajectories(pulses, delta, eps,
                       r0: Tuple[float, float, float] = (0.0, 0.0, 1.0)):
    """Bloch trajectories of an initial state under a composite pulse for a
    batch of disorder samples.

    Args:
      pulses: ``(L, 2)``; delta/eps: ``(S,)``.
    Returns:
      ``(S, L+1, 3)`` numpy Bloch vectors (step 0 = initial state).
    """
    return np.asarray(_trajectories(
        jnp.asarray(pulses), jnp.asarray(delta), jnp.asarray(eps),
        jnp.asarray(r0, jnp.float32)))


def animate_bloch_ensemble(pulses, u_target=None, delta_std: float = 0.5,
                           epsilon_std: float = 0.05, n_samples: int = 16,
                           save_path: Optional[str] = None, fps: int = 15,
                           title: str = "",
                           key: Optional[jax.Array] = None):
    """Animate the disorder ensemble on a matplotlib 3D Bloch sphere with a
    running time / E[F] title (reference ``animate_multi_error_bloch``,
    util.py:427-519).  Saves mp4 (ffmpeg) or falls back to gif (pillow).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    delta = jax.random.normal(k1, (n_samples,)) * delta_std
    eps = jax.random.normal(k2, (n_samples,)) * epsilon_std
    traj = bloch_trajectories(pulses, delta, eps)  # (S, L+1, 3)
    t_cum = np.concatenate([[0.0], np.cumsum(np.asarray(pulses)[:, 1])])

    mean_fid = None
    if u_target is not None:
        q_t = (su2.su2_to_quat(jnp.asarray(u_target, jnp.complex64))
               if jnp.asarray(u_target).ndim >= 2 else jnp.asarray(u_target))
        q_out = propagate_scan(jnp.asarray(pulses)[None], delta, eps)
        mean_fid = float(jnp.mean(su2.quat_fidelity(q_out, q_t)))

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")

    def draw_sphere():
        u = np.linspace(0, 2 * np.pi, 40)
        v = np.linspace(0, np.pi, 20)
        xs = np.outer(np.cos(u), np.sin(v))
        ys = np.outer(np.sin(u), np.sin(v))
        zs = np.outer(np.ones_like(u), np.cos(v))
        ax.plot_wireframe(xs, ys, zs, color="lightgray", linewidth=0.3,
                          alpha=0.5)
        for axis, lbl in zip(np.eye(3), ["x", "y", "z"]):
            ax.quiver(0, 0, 0, *axis, color="gray", arrow_length_ratio=0.08,
                      linewidth=0.8)
            ax.text(*(axis * 1.25), lbl)
        ax.set_xlim(-1.1, 1.1)
        ax.set_ylim(-1.1, 1.1)
        ax.set_zlim(-1.1, 1.1)
        ax.set_axis_off()

    n_frames = traj.shape[1]

    def update(frame):
        ax.clear()
        draw_sphere()
        for s in range(traj.shape[0]):
            ax.plot(traj[s, :frame + 1, 0], traj[s, :frame + 1, 1],
                    traj[s, :frame + 1, 2], lw=0.7, alpha=0.6)
            ax.scatter(*traj[s, frame], s=10)
        extra = f", E[F] = {mean_fid:.4f}" if mean_fid is not None else ""
        ax.set_title(f"{title} t = {t_cum[frame] / np.pi:.2f}π{extra}")
        return []

    anim = animation.FuncAnimation(fig, update, frames=n_frames,
                                   blit=False)
    saved_path = None
    if save_path is not None:
        try:
            anim.save(save_path, writer=animation.FFMpegWriter(fps=fps))
            saved_path = str(save_path)
        except (FileNotFoundError, RuntimeError):
            saved_path = str(save_path).rsplit(".", 1)[0] + ".gif"
            anim.save(saved_path, writer=animation.PillowWriter(fps=fps))
        plt.close(fig)
        return saved_path
    return anim
