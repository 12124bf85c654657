r"""SU(4) target-set construction — Cartan-class coverage + phase handling.

Round-3 finding (docs/two_qubit_results.md §Named-gate coverage): a model
trained only on zero-disorder propagations of random pulse sequences fails
on the canonical named gates (CZ/CNOT/iSWAP score ≈ chance at σ=0 despite
0.99+ universal eval) for two distinct reasons:

1. **Global-phase convention.** Entanglement fidelity is phase-invariant
   but the raw (re, im) matrix featurization is not.  Training products are
   det = 1 with the phase the dynamics produce; textbook gates like
   CZ = diag(1,1,1,−1) have det = −1.  Measured: the shipped model scores
   0.267 on zz(π/4) as written and 0.9992 on its best SU(4) ℤ₄
   representative.  Fix: :func:`z4_representatives` at inference (pick the
   best of 4) and :func:`random_global_phase` augmentation at training.

2. **Cartan (Weyl-chamber) coverage.** Random pulse products concentrate
   away from the chamber's edges; CZ/CNOT live at c = (π/4, 0, 0) and
   iSWAP at (π/4, π/4, 0) — classes the training distribution essentially
   never visits.  Fix: :func:`kak_targets` — (A₁⊗A₂)·exp(−i Σ cₖ σₖσₖ)·
   (B₁⊗B₂) with c drawn uniformly over the chamber box, mixed into the
   training set.

No reference equivalent exists (the reference ships no two-qubit code);
the single-qubit analog is ``build_SU2_dataset``
(universal_single_qubit_SCORE.py:215-251), whose grid+random split this
module's product+KAK mix mirrors.  All construction is HOST numpy
(complex128) — eager complex ops are unimplemented on some remote-device
backends, and this is a one-time dataset build.
"""

from __future__ import annotations

import numpy as np

__all__ = ["haar_su2", "kak_targets", "random_global_phase",
           "z4_representatives"]

_X = np.array([[0, 1], [1, 0]], np.complex128)
_Y = np.array([[0, -1j], [1j, 0]], np.complex128)
_Z = np.array([[1, 0], [0, -1]], np.complex128)
_XX = np.kron(_X, _X)
_YY = np.kron(_Y, _Y)
_ZZ = np.kron(_Z, _Z)


def haar_su2(rng: np.random.Generator, n: int) -> np.ndarray:
    """``(n, 2, 2)`` Haar-random SU(2) via normalized quaternions."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([w + 1j * z, y + 1j * x], -1),
        np.stack([-y + 1j * x, w - 1j * z], -1)], -2)


def _cartan_exp(c: np.ndarray) -> np.ndarray:
    """``exp(−i(c₁·XX + c₂·YY + c₃·ZZ))`` for ``(n, 3)`` → ``(n, 4, 4)``.

    XX, YY, ZZ commute pairwise (the Cartan subalgebra is abelian) and are
    simultaneously diagonalized by the magic basis; here the closed form is
    assembled directly from the three commuting exponentials."""
    out = np.empty((c.shape[0], 4, 4), np.complex128)
    for i, (c1, c2, c3) in enumerate(c):
        w, v = np.linalg.eigh(c1 * _XX + c2 * _YY + c3 * _ZZ)
        out[i] = (v * np.exp(-1j * w)) @ v.conj().T
    return out


def kak_targets(rng: np.random.Generator, n: int,
                c_max: float = np.pi / 4) -> np.ndarray:
    """``(n, 4, 4)`` SU(4) targets with uniform Weyl-chamber-box coverage:
    ``(A₁⊗A₂) · exp(−i Σ cₖ σₖσₖ) · (B₁⊗B₂)``, cₖ ~ U(0, c_max) sorted
    descending (the chamber convention c₁ ≥ c₂ ≥ c₃ ≥ 0).  Every local
    equivalence class in the box — including the CZ/CNOT edge (π/4, 0, 0)
    and the iSWAP edge (π/4, π/4, 0) — is a positive-density neighborhood."""
    c = np.sort(rng.uniform(0.0, c_max, size=(n, 3)), axis=1)[:, ::-1]
    A1, A2 = haar_su2(rng, n), haar_su2(rng, n)
    B1, B2 = haar_su2(rng, n), haar_su2(rng, n)
    core = _cartan_exp(c)
    kA = np.einsum("nab,ncd->nacbd", A1, A2).reshape(n, 4, 4)
    kB = np.einsum("nab,ncd->nacbd", B1, B2).reshape(n, 4, 4)
    return kA @ core @ kB


def random_global_phase(rng: np.random.Generator,
                        U: np.ndarray) -> np.ndarray:
    """Multiply each target by a random global phase e^{iθ}, θ ~ U(0, 2π).

    Physics-neutral (entanglement fidelity is phase-invariant) but it
    teaches the raw-matrix featurization the invariance — the training-side
    complement of :func:`z4_representatives`."""
    theta = rng.uniform(0.0, 2.0 * np.pi, size=U.shape[0])
    return U * np.exp(1j * theta)[:, None, None]


def z4_representatives(U: np.ndarray) -> np.ndarray:
    """The 4 SU(4) representatives of one gate: det-normalize, then the ℤ₄
    phases ``{1, i, −1, −i}`` (det c·U = c⁴·det U leaves a ℤ₄ ambiguity).
    ``(4, 4)`` complex → ``(4, 4, 4)``.  Inference-time canonicalization:
    run the model on all four, keep the best (two_qubit_eval --best_phase)."""
    U = np.asarray(U, np.complex128)
    c = np.linalg.det(U) ** (-0.25)
    return np.stack([c * U * p for p in (1.0, 1j, -1.0, -1j)])
