r"""Static-disorder samplers on explicit JAX PRNG keys.

Reference samplers (train/unitary_single_qubit_gate/universal_single_qubit_SCORE.py:154-161)
draw ``δ ~ N(0, σ_δ²)`` (off-resonant error, ORE) and ``ε ~ N(0, σ_ε²)``
(pulse-length error, PLE) with implicit torch global RNG.  Here every draw
takes an explicit key so sampling is reproducible, shardable, and jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax


__all__ = ["sample_ore", "sample_ore_ple", "ore_ple_sampler"]


def sample_ore(key: jax.Array, shape, delta_std: float = 1.0) -> jax.Array:
    """ORE-only draw: ``δ ~ N(0, δ_std²)`` (reference SCORE.py:154-155)."""
    return jax.random.normal(key, shape) * delta_std


def sample_ore_ple(
    key: jax.Array,
    shape,
    delta_std: float = 1.0,
    epsilon_std: float = 0.05,
) -> Tuple[jax.Array, jax.Array]:
    """ORE+PLE draw: independent gaussians ``(δ, ε)`` of the given shape.

    Reference ``get_ore_ple_error_distribution`` (SCORE.py:158-161) returns a
    stacked ``(2, B)``; we return a tuple so shapes can carry a separate MC
    axis ``(B, M)`` without reshaping.
    """
    k1, k2 = jax.random.split(key)
    delta = jax.random.normal(k1, shape) * delta_std
    epsilon = jax.random.normal(k2, shape) * epsilon_std
    return delta, epsilon


def ore_ple_sampler(delta_std: float, epsilon_std: float = 0.05):
    """Bind disorder stds, returning ``λ(key, shape) -> (δ, ε)``.

    Mirrors the reference trainer's partial application
    (model/universal_model_trainer.py:127-131).
    """

    def sampler(key: jax.Array, shape):
        return sample_ore_ple(key, shape, delta_std, epsilon_std)

    return sampler
