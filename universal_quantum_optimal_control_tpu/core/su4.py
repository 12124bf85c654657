r"""SU(4) two-qubit propagation — cross-talk + off-resonant disorder.

The reference README advertises a two-qubit workload (`train/two_qubit/`,
README.md:87) but ships no code for it; BASELINE.json configs[4] mandates
"two-qubit entangling gate (SU(4) propagation, cross-talk + off-resonant
disorder) with finetuned single-qubit pretraining".  This module defines the
physics contract, generalized from the single-qubit Hamiltonian
(SCORE.py:117-124):

    H(φ; δ₁, δ₂, ε) = ½(1+ε)·[cos φ·X₁ + sin φ·Y₁ + χ·(cos φ·X₂ + sin φ·Y₂)]
                      + ½·(δ₁·Z₁ + δ₂·Z₂) + J·Z₁Z₂

i.e. qubit 1 is driven directly, qubit 2 sees a cross-talk fraction χ of the
same drive, each qubit has independent static off-resonance δᵢ ~ N(0, σ_δ²),
the drive amplitude carries a shared pulse-length error ε ~ N(0, σ_ε²), and
an always-on ZZ coupling J provides the entangling resource.

TPU-native representation: unitaries are (real, imag) pairs of 4×4 float32
matrices (no complex dtype on the hot path); the segment exponential is a
scaled-and-squared Taylor series (exact to <1e-7 for the pulse spaces here,
differentiable everywhere — eigh would be non-differentiable at spectral
degeneracies, which symmetric two-qubit configs hit routinely).
"""

from __future__ import annotations


from typing import NamedTuple, Tuple

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TwoQubitSystem",
    "pauli_strings",
    "su4_hamiltonian",
    "expm_taylor_ri",
    "propagate_su4",
    "propagate_su4_mc",
    "fidelity_su4_ri",
    "ri_from_complex",
    "complex_from_ri",
]

# ---------------------------------------------------------------------------
# Pauli strings (numpy constants; embedded as literals at trace time)
# ---------------------------------------------------------------------------

_I = np.eye(2)
_X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
_Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
_Z = np.array([[1, 0], [0, -1]], dtype=np.complex128)


def _kron(a, b):
    return np.kron(a, b)


def pauli_strings() -> dict:
    """Two-qubit Pauli strings as complex128 numpy 4×4 matrices."""
    return {
        "X1": _kron(_X, _I), "Y1": _kron(_Y, _I), "Z1": _kron(_Z, _I),
        "X2": _kron(_I, _X), "Y2": _kron(_I, _Y), "Z2": _kron(_I, _Z),
        "ZZ": _kron(_Z, _Z), "I": np.eye(4, dtype=np.complex128),
    }


_P = pauli_strings()
# real/imag split constants, float32 — kept as HOST numpy arrays: module-level
# device arrays would be embedded as constants at jit-lowering time via a
# device-to-host fetch (slow/fragile on remote-device backends)
_XR = {k: np.asarray(v.real, np.float32) for k, v in _P.items()}
_XI = {k: np.asarray(v.imag, np.float32) for k, v in _P.items()}


class TwoQubitSystem(NamedTuple):
    """Static system parameters: cross-talk fraction, ZZ coupling, and the
    segment-exponential accuracy knobs (Taylor order / squaring levels).
    The order-8 default uses a Paterson–Stockmeyer evaluation (4 matmuls +
    squarings) and is exact to <1e-7 for ‖Hτ‖ ≲ 4; measured on v5e it is
    also FASTER than lower-order term chains (more matmul parallelism), so
    only change these for accuracy reasons.

    ``drive2``: the system variant with a SECOND direct drive line on
    qubit 2 (symmetric cross-talk: each line leaks a χ fraction onto the
    other qubit).  Pulse tables then carry 4 parameters per segment —
    (φ₁, φ₂, Ω, τ) with a shared amplitude Ω and shared pulse-length error:

        H = ½(1+ε)Ω·[cos φ₁·X₁ + sin φ₁·Y₁ + χ(cos φ₁·X₂ + sin φ₁·Y₂)
                     + cos φ₂·X₂ + sin φ₂·Y₂ + χ(cos φ₂·X₁ + sin φ₂·Y₁)]
            + ½(δ₁Z₁ + δ₂Z₂) + J·Z₁Z₂

    This is the ROADMAP "direct drive on qubit 2" falsification variant for
    the δ₂-dephasing robustness ceiling (docs/two_qubit_results.md): with a
    direct drive, δ₂ becomes refocusable (echo pulses on qubit 2), which the
    cross-talk-only system structurally forbids (analysis/dephasing_bound)."""

    xtalk: float = 0.1
    coupling: float = 0.5
    expm_order: int = 8
    expm_scaling: int = 4
    drive2: bool = False


def ri_from_complex(U: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return jnp.real(U).astype(jnp.float32), jnp.imag(U).astype(jnp.float32)


def complex_from_ri(Ur: jax.Array, Ui: jax.Array) -> jax.Array:
    return (Ur + 1j * Ui).astype(jnp.complex64)


def su4_hamiltonian(phi: jax.Array, delta1: jax.Array, delta2: jax.Array,
                    epsilon: jax.Array,
                    system: TwoQubitSystem,
                    omega: jax.Array = None,
                    phi2: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
    """H as (real, imag) float32 pair, broadcasting over leading axes.

    phi/delta/epsilon: ``(...,)`` → ``(..., 4, 4)`` each.  ``omega`` (optional)
    scales the drive amplitude (3-parameter pulse space); default 1.
    ``phi2`` (optional) adds the second direct drive line on qubit 2 with
    symmetric cross-talk (``TwoQubitSystem.drive2`` variant).
    """
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    amp = 0.5 * (1.0 + epsilon)
    if omega is not None:
        amp = amp * jnp.maximum(omega, 0.0)
    chi = system.xtalk

    cx1, cy1 = amp * c, amp * s
    cx2, cy2 = amp * chi * c, amp * chi * s
    if phi2 is not None:
        c2 = jnp.cos(phi2)
        s2 = jnp.sin(phi2)
        cx2 = cx2 + amp * c2
        cy2 = cy2 + amp * s2
        cx1 = cx1 + amp * chi * c2
        cy1 = cy1 + amp * chi * s2

    def mix(table):
        return (
            cx1[..., None, None] * table["X1"]
            + cy1[..., None, None] * table["Y1"]
            + cx2[..., None, None] * table["X2"]
            + cy2[..., None, None] * table["Y2"]
            + (0.5 * delta1)[..., None, None] * table["Z1"]
            + (0.5 * delta2)[..., None, None] * table["Z2"]
            + jnp.broadcast_to(system.coupling * table["ZZ"],
                               jnp.broadcast_shapes(phi.shape, delta1.shape,
                                                    delta2.shape,
                                                    epsilon.shape) + (4, 4))
        )

    return mix(_XR), mix(_XI)


def _matmul_ri(ar, ai, br, bi):
    """Complex matmul on (re, im) pairs — 3 real matmuls (Karatsuba).

    Precision is pinned to HIGHEST: TPU MXU default precision truncates f32
    matmul inputs to bf16, and over L=40 segments × (Taylor + 4 squarings +
    running product) the rounding compounds into ~2% non-unitarity —
    measured eval "fidelity" 1.04 on v5e before this pin (CPU tests never
    see it; the SoA Pallas kernel is elementwise-FMA f32 and exact either
    way).  The 4×4 matmuls are tiny, so the 3-pass cost is irrelevant.

    NOTE: this trailing-(4, 4) layout is kept for API-level callers, but
    the propagator hot path runs in the SoA (entries-leading) layout below
    — on TPU, XLA tiles a trailing (4, 4) to (4, 128) lanes (32× memory
    padding), which OOMs the scan VJP at training scale."""
    P = jax.lax.Precision.HIGHEST
    k1 = jnp.matmul(ar, br + bi, precision=P)
    k2 = jnp.matmul(ar + ai, bi, precision=P)
    k3 = jnp.matmul(ai - ar, br, precision=P)
    return k1 - k2, k1 + k3


# ---------------------------------------------------------------------------
# SoA (structure-of-arrays) layout: a 4×4 complex matrix is a pair of
# (16, ...) float32 arrays (entry (i, j) at index 4·i+j), batch dims LAST.
# The minor-most dims are then batch/MC axes, which tile (8, 128) exactly —
# zero padding, full VPU lane utilization, and f32 FMA arithmetic (no MXU
# bf16 truncation).  This is the same layout as the fused Pallas kernel
# (ops/propagate_su4_pallas.py), expressed in plain XLA so it autodiffs.
# ---------------------------------------------------------------------------


def _matmul16(ar, ai, br, bi):
    """SoA complex matmul: ``(16, ...)`` pairs → ``(16, ...)`` pair.

    The 4×4×4 contraction is unrolled into 64 complex FMA chains on the
    batch lanes."""
    cr, ci = [], []
    for i in range(4):
        for j in range(4):
            re = im = None
            for k in range(4):
                a_r, a_i = ar[4 * i + k], ai[4 * i + k]
                b_r, b_i = br[4 * k + j], bi[4 * k + j]
                t_r = a_r * b_r - a_i * b_i
                t_i = a_r * b_i + a_i * b_r
                re = t_r if re is None else re + t_r
                im = t_i if im is None else im + t_i
            cr.append(re)
            ci.append(im)
    return jnp.stack(cr), jnp.stack(ci)


def _h16(phi, delta1, delta2, epsilon, system, omega=None, phi2=None):
    """Hamiltonian in SoA layout: batch scalars ``(...,)`` → ``(16, ...)``
    (re, im) pair.  Zero Pauli-table coefficients are folded at trace time
    (most of the 16 entries touch only 1-3 of the 7 strings)."""
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    amp = 0.5 * (1.0 + epsilon)
    if omega is not None:
        amp = amp * jnp.maximum(omega, 0.0)
    chi = system.xtalk
    cx1, cy1 = amp * c, amp * s
    cx2, cy2 = amp * chi * c, amp * chi * s
    if phi2 is not None:
        c2 = jnp.cos(phi2)
        s2 = jnp.sin(phi2)
        cx2 = cx2 + amp * c2
        cy2 = cy2 + amp * s2
        cx1 = cx1 + amp * chi * c2
        cy1 = cy1 + amp * chi * s2
    coefs = [(cx1, "X1"), (cy1, "Y1"),
             (cx2, "X2"), (cy2, "Y2"),
             (0.5 * delta1, "Z1"), (0.5 * delta2, "Z2")]
    shape = jnp.broadcast_shapes(phi.shape, delta1.shape, delta2.shape,
                                 epsilon.shape)
    zero = jnp.zeros(shape, jnp.float32)

    def build(table):
        rows = []
        for i in range(4):
            for j in range(4):
                e = None
                for arr, name in coefs:
                    w = float(table[name][i, j])
                    if w != 0.0:
                        t = arr * w
                        e = t if e is None else e + t
                wzz = float(system.coupling * table["ZZ"][i, j])
                if wzz != 0.0:
                    e = (zero + wzz) if e is None else e + wzz
                rows.append(jnp.broadcast_to(e if e is not None else zero,
                                             shape))
        return jnp.stack(rows)

    return build(_XR), build(_XI)


_EYE16 = np.eye(4, dtype=np.float32).reshape(16)


def _expm16(Hr, Hi, tau, order=8, scaling=4):
    """``exp(−i·H·τ)`` in SoA layout — same Paterson–Stockmeyer order-8 +
    squaring scheme as :func:`expm_taylor_ri`."""
    scale = tau / (2.0 ** scaling)
    Ar = Hi * scale
    Ai = -Hr * scale

    eye = jnp.asarray(_EYE16).reshape(16, *([1] * (Ar.ndim - 1)))

    if order == 8:
        c = [1.0 / math.factorial(k) for k in range(9)]
        A2 = _matmul16(Ar, Ai, Ar, Ai)
        A3 = _matmul16(A2[0], A2[1], Ar, Ai)
        A4 = _matmul16(A2[0], A2[1], A2[0], A2[1])
        Pr = c[0] * eye + c[1] * Ar + c[2] * A2[0] + c[3] * A3[0]
        Pi = c[1] * Ai + c[2] * A2[1] + c[3] * A3[1]
        Qr = (c[4] * eye + c[5] * Ar + c[6] * A2[0] + c[7] * A3[0]
              + c[8] * A4[0])
        Qi = c[5] * Ai + c[6] * A2[1] + c[7] * A3[1] + c[8] * A4[1]
        Mr, Mi = _matmul16(A4[0], A4[1], Qr, Qi)
        Ur, Ui = Pr + Mr, Pi + Mi
    else:
        Ur, Ui = eye + Ar, Ai
        Tr_, Ti_ = Ar, Ai
        for k in range(2, order + 1):
            Tr_, Ti_ = _matmul16(Tr_, Ti_, Ar / k, Ai / k)
            Ur, Ui = Ur + Tr_, Ui + Ti_

    for _ in range(scaling):
        Ur, Ui = _matmul16(Ur, Ui, Ur, Ui)
    return Ur, Ui


def expm_taylor_ri(Hr: jax.Array, Hi: jax.Array, tau: jax.Array,
                   order: int = 8, scaling: int = 4) -> Tuple[jax.Array, jax.Array]:
    """``exp(−i·H·τ)`` on (re, im) pairs via scaled Taylor + squaring.

    A = −i·H·τ/2^s  ⇒  (Ar, Ai) = (Hi·τ/2^s, −Hr·τ/2^s).  With ‖Hτ‖ ≲ 4 and
    s=4, the order-8 truncation error is < 1e-10; gradients are polynomial
    (differentiable everywhere, unlike eigh at degeneracies).

    The degree-8 polynomial is evaluated Paterson–Stockmeyer style:
    ``T8 = P + A4·Q`` with P, Q cubics in precomputed A2/A3 — 4 matmuls
    instead of 7 for the Horner/term chain (order ≠ 8 falls back to the
    plain term recurrence).
    """
    scale = tau[..., None, None] / (2.0 ** scaling)
    Ar = Hi * scale
    Ai = -Hr * scale

    eye = jnp.broadcast_to(jnp.eye(4, dtype=Ar.dtype), Ar.shape)
    zero = jnp.zeros_like(Ar)

    if order == 8:
        c = [1.0 / math.factorial(k) for k in range(9)]
        A2 = _matmul_ri(Ar, Ai, Ar, Ai)
        A3 = _matmul_ri(A2[0], A2[1], Ar, Ai)
        A4 = _matmul_ri(A2[0], A2[1], A2[0], A2[1])
        # P = c0 I + c1 A + c2 A2 + c3 A3 ;  Q = c4 I + c5 A + c6 A2 + c7 A3
        #   + c8 A4 ;  T8 = P + A4 @ Q
        Pr = c[0] * eye + c[1] * Ar + c[2] * A2[0] + c[3] * A3[0]
        Pi = c[1] * Ai + c[2] * A2[1] + c[3] * A3[1]
        Qr = (c[4] * eye + c[5] * Ar + c[6] * A2[0] + c[7] * A3[0]
              + c[8] * A4[0])
        Qi = c[5] * Ai + c[6] * A2[1] + c[7] * A3[1] + c[8] * A4[1]
        Mr, Mi = _matmul_ri(A4[0], A4[1], Qr, Qi)
        Ur, Ui = Pr + Mr, Pi + Mi
    else:
        Ur, Ui = eye + Ar, zero + Ai  # I + A
        Tr_, Ti_ = Ar, Ai
        for k in range(2, order + 1):
            Tr_, Ti_ = _matmul_ri(Tr_, Ti_, Ar / k, Ai / k)
            Ur, Ui = Ur + Tr_, Ui + Ti_

    for _ in range(scaling):
        Ur, Ui = _matmul_ri(Ur, Ui, Ur, Ui)
    return Ur, Ui


def propagate_su4(pulses: jax.Array, delta1: jax.Array, delta2: jax.Array,
                  epsilon: jax.Array,
                  system: TwoQubitSystem = TwoQubitSystem(),
                  layout: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """Compose ``U_L ⋯ U_1`` for two-qubit phase-control sequences.

    pulses: ``(..., L, 2)`` (φ, τ), ``(..., L, 3)`` (φ, Ω, τ) or — when
    ``system.drive2`` — ``(..., L, 4)`` (φ₁, φ₂, Ω, τ); disorder: ``(...,)``
    each.  Returns (re, im) pair ``(..., 4, 4)``.

    ``layout``: "soa" scans in the entries-leading ``(16, batch)`` layout —
    on TPU a trailing (4, 4) tiles to (4, 128) lanes, so the scan VJP pays
    32× memory padding and the matmuls waste 124/128 lanes (measured: OOM at
    training scale + 4.5× lower throughput); "ri" keeps trailing-(4, 4)
    matmuls, which CPU executes much faster than 64 unrolled FMA chains.
    "auto" picks by backend.  Both layouts are numerically identical
    (tests/test_su4.py::test_soa_and_ri_layouts_agree).
    """
    if layout == "auto":
        layout = "ri" if jax.default_backend() == "cpu" else "soa"
    P = pulses.shape[-1]
    phi = jnp.moveaxis(pulses[..., 0], -1, 0)  # (L, ...)
    tau = jnp.moveaxis(pulses[..., -1], -1, 0)
    if system.drive2:
        if P != 4:
            raise ValueError(
                f"system.drive2 expects 4-parameter pulses (phi1, phi2, "
                f"omega, tau); got P={P}")
        phi2 = jnp.moveaxis(pulses[..., 1], -1, 0)
        omega = jnp.moveaxis(pulses[..., 2], -1, 0)
    else:
        if P not in (2, 3):
            raise ValueError(f"unsupported pulse parameter count: {P}")
        phi2 = None
        omega = jnp.moveaxis(pulses[..., 1], -1, 0) if P == 3 else None

    batch_shape = jnp.broadcast_shapes(
        phi.shape[1:], delta1.shape, delta2.shape, epsilon.shape)
    xs = tuple(x for x in (phi, phi2, omega, tau) if x is not None)

    def unpack(pt):
        """Scan slice → (phi_k, phi2_k, om_k, tau_k), absent ones None."""
        it = iter(pt)
        phi_k = next(it)
        phi2_k = next(it) if phi2 is not None else None
        om_k = next(it) if omega is not None else None
        tau_k = next(it)
        bc = lambda x: (jnp.broadcast_to(x, batch_shape)
                        if x is not None else None)
        return bc(phi_k), bc(phi2_k), bc(om_k), jnp.broadcast_to(
            tau_k, batch_shape)

    if layout == "soa":
        # SoA carry: (16, *batch) (re, im) — batch dims minor-most, so the
        # scan carry and every Taylor intermediate tile (8, 128), no padding
        eye16 = jnp.asarray(_EYE16).reshape(16, *([1] * len(batch_shape)))
        init = (jnp.broadcast_to(eye16, (16,) + batch_shape),
                jnp.zeros((16,) + batch_shape, jnp.float32))

        def body(carry, pt):
            phi_k, phi2_k, om_k, tau_k = unpack(pt)
            Hr, Hi = _h16(phi_k,
                          jnp.broadcast_to(delta1, batch_shape),
                          jnp.broadcast_to(delta2, batch_shape),
                          jnp.broadcast_to(epsilon, batch_shape),
                          system, omega=om_k, phi2=phi2_k)
            Ukr, Uki = _expm16(Hr, Hi, tau_k,
                               order=system.expm_order,
                               scaling=system.expm_scaling)
            return _matmul16(Ukr, Uki, *carry), None

        (Ur16, Ui16), _ = jax.lax.scan(body, init, xs)
        # back to the API layout (..., 4, 4)
        Ur = jnp.moveaxis(Ur16, 0, -1).reshape(batch_shape + (4, 4))
        Ui = jnp.moveaxis(Ui16, 0, -1).reshape(batch_shape + (4, 4))
        return Ur, Ui

    if layout != "ri":
        raise ValueError(f"unknown layout {layout!r} (soa | ri | auto)")

    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                           batch_shape + (4, 4))
    init = (eye + jnp.zeros(batch_shape + (4, 4), jnp.float32),
            jnp.zeros(batch_shape + (4, 4), jnp.float32))

    def body_ri(carry, pt):
        phi_k, phi2_k, om_k, tau_k = unpack(pt)
        Hr, Hi = su4_hamiltonian(
            phi_k, delta1, delta2, epsilon, system, omega=om_k, phi2=phi2_k)
        Ukr, Uki = expm_taylor_ri(Hr, Hi, tau_k,
                                  order=system.expm_order,
                                  scaling=system.expm_scaling)
        return _matmul_ri(Ukr, Uki, *carry), None

    (Ur, Ui), _ = jax.lax.scan(body_ri, init, xs)
    return Ur, Ui


def propagate_su4_mc(pulses: jax.Array, delta1: jax.Array, delta2: jax.Array,
                     epsilon: jax.Array,
                     system: TwoQubitSystem = TwoQubitSystem(),
                     layout: str = "auto"):
    """MC-fused form: pulses ``(B, L, 2)``, disorder ``(B, M)`` →
    (re, im) ``(B, M, 4, 4)`` without materializing pulse repeats."""
    return propagate_su4(pulses[:, None, :, :], delta1, delta2, epsilon,
                         system, layout=layout)


def fidelity_su4_ri(Ur: jax.Array, Ui: jax.Array, Tr_r: jax.Array,
                    Tr_i: jax.Array) -> jax.Array:
    """Entanglement fidelity ``(|Tr(U†T)|² + d)/(d(d+1))`` for d=4 on
    (re, im) pairs (same normalization as SCORE.py:168-183).

    Tr(U†T) = Σᵢⱼ conj(Uᵢⱼ)·Tᵢⱼ = Σ (Ur·Tr + Ui·Ti) + i·Σ (Ur·Ti − Ui·Tr).
    """
    re = jnp.sum(Ur * Tr_r + Ui * Tr_i, axis=(-2, -1))
    im = jnp.sum(Ur * Tr_i - Ui * Tr_r, axis=(-2, -1))
    t2 = re * re + im * im
    d = 4.0
    return (t2 + d) / (d * (d + 1))
