r"""dCRAB — dressed Chopped RAndom Basis optimization, TPU-native.

The reference (train/dCRAB/dCRAB.py) optimizes a Fourier-parameterized phase
control ``φ(t) = φ₀ + Σₙ aₙ cos(ωₙt) + bₙ sin(ωₙt)`` on random frequencies
with per-round Nelder–Mead over a NumPy/SciPy objective that sequentially
``expm``s 600 time steps per disorder sample (dCRAB.py:37-59) — thousands of
serial CPU matrix exponentials per objective evaluation.

Here the objective is one jitted function:

* the Fourier synthesis is a single ``(T_steps × N_modes)`` matmul (MXU),
* propagation is the quaternion scan over time steps × all disorder samples,
* the infidelity reduces on-chip.

Two optimization modes:

* **gradient** (``optimize_dcrab_grad``) — Adam via ``jax.grad`` through the
  propagator (the BASELINE.json-mandated mode), all restarts batched.
* **derivative-free** (``optimize_dcrab_nm``) — a JAX-native vectorized
  Nelder–Mead (`lax.while_loop`), running all restart rounds as a batch; a
  SciPy fallback mirrors the reference loop exactly.

Reference quirks preserved: the un-squared trace fidelity
``(|Tr| + 2)/6`` (dCRAB.py:58 — max 2/3), module defaults DELTA_STD=0.4,
EPSILON_STD=0.05 (dCRAB.py:6-7), initial params φ₀=0 with small random
amplitudes (dCRAB.py:95-96).
"""

from __future__ import annotations

import dataclasses

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.su2 import quat_multiply, quat_trace_inner, segment_quat, su2_to_quat

__all__ = ["DcrabConfig", "build_phi", "propagate_phase_control",
           "average_infidelity", "optimize_dcrab_grad", "optimize_dcrab_nm",
           "dcrab_optimize"]

DELTA_STD = 0.4    # reference dCRAB.py:6
EPSILON_STD = 0.05  # reference dCRAB.py:7


@dataclasses.dataclass(frozen=True)
class DcrabConfig:
    T: float = 6.0
    dt: float = 0.01
    n_modes: int = 12
    rounds: int = 5
    samples: int = 100
    w_min: float = 0.0
    w_max: float = 10.0
    delta_std: float = DELTA_STD
    epsilon_std: float = EPSILON_STD
    seed: int = 0


def build_phi(params: jax.Array, t: jax.Array, omegas: jax.Array) -> jax.Array:
    """Fourier synthesis ``φ(t)`` (reference dCRAB.py:26-34) as one matmul.

    params: ``(..., 1 + 2N)`` = ``[φ₀, a₁..a_N, b₁..b_N]``; t: ``(T,)``;
    omegas: ``(..., N)`` → φ: ``(..., T)``.
    """
    N = omegas.shape[-1]
    phi0 = params[..., :1]
    a = params[..., 1:1 + N]
    b = params[..., 1 + N:1 + 2 * N]
    wt = omegas[..., :, None] * t  # (..., N, T)
    # (..., 1, N) @ (..., N, T) -> (..., 1, T): MXU-friendly contraction.
    # Precision pinned: TPU default truncates f32 MXU inputs to bf16, which
    # at N=2000 modes costs ~1e-2 absolute phase error in the synthesis.
    P = jax.lax.Precision.HIGHEST
    synth = (jnp.matmul(a[..., None, :], jnp.cos(wt), precision=P)
             + jnp.matmul(b[..., None, :], jnp.sin(wt), precision=P))
    return phi0 + synth[..., 0, :]


def propagate_phase_control(phi_t: jax.Array, dt: float, delta: jax.Array,
                            eps: jax.Array) -> jax.Array:
    """Time-stepped propagation under ``H = ½(1+ε)(cosφ X + sinφ Y + δZ)``
    with fixed step dt (reference dCRAB.py:37-44), as a quaternion scan.

    phi_t: ``(..., T)``; delta/eps: ``(S,)`` broadcastable → ``(..., S, 4)``.
    """
    def body(carry, phi_k):
        q_k = segment_quat(phi_k[..., None], dt, delta, eps)
        return quat_multiply(q_k, carry), None

    shape = jnp.broadcast_shapes(phi_t.shape[:-1] + delta.shape,
                                 phi_t.shape[:-1] + eps.shape)
    init = jnp.zeros(shape + (4,), phi_t.dtype).at[..., 0].set(1.0)
    out, _ = jax.lax.scan(body, init, jnp.moveaxis(phi_t, -1, 0))
    return out


def average_infidelity(params: jax.Array, t: jax.Array, omegas: jax.Array,
                       q_target: jax.Array, delta: jax.Array,
                       eps: jax.Array, dt: float) -> jax.Array:
    """``1 − E_S[(|Tr(U_t† U)| + 2)/6]`` (reference dCRAB.py:47-59)."""
    phi_t = build_phi(params, t, omegas)
    q = propagate_phase_control(phi_t, dt, delta, eps)
    tr = jnp.abs(quat_trace_inner(q, q_target))
    fid = (tr + 2.0) / 6.0
    return 1.0 - jnp.mean(fid, axis=-1)


def _setup(u_target, config: DcrabConfig, key):
    """Common setup: time grid, disorder draws, per-round frequencies,
    initial parameters, target quaternion."""
    cfg = config
    t = jnp.arange(0.0, cfg.T, cfg.dt)
    k_err, k_freq, k_init = jax.random.split(key, 3)
    kd, ke = jax.random.split(k_err)
    delta = jax.random.normal(kd, (cfg.samples,)) * cfg.delta_std
    eps = jax.random.normal(ke, (cfg.samples,)) * cfg.epsilon_std
    omegas = jax.random.uniform(
        k_freq, (cfg.rounds, cfg.n_modes), minval=cfg.w_min, maxval=cfg.w_max)
    n_params = 1 + 2 * cfg.n_modes
    x0 = jnp.zeros((cfg.rounds, n_params))
    x0 = x0.at[:, 1:].set(
        0.01 * jax.random.normal(k_init, (cfg.rounds, n_params - 1)))
    q_target = _as_quat(u_target)
    return t, delta, eps, omegas, x0, q_target


def _as_quat(u_target) -> jax.Array:
    u = jnp.asarray(u_target)
    if u.shape[-1] == 4 and u.ndim == 1:
        return u.astype(jnp.float32)
    return su2_to_quat(u.astype(jnp.complex64))


def optimize_dcrab_grad(
    u_target,
    config: DcrabConfig = DcrabConfig(),
    steps: int = 500,
    learning_rate: float = 0.02,
    key: Optional[jax.Array] = None,
) -> Tuple[Tuple[np.ndarray, np.ndarray], float]:
    """Gradient-mode dCRAB: Adam on the Fourier coefficients through the
    jitted propagator, ALL restart rounds batched in one device program.

    Returns ``((best_params, best_omegas), best_fidelity)`` matching the
    reference's return convention (dCRAB.py:121-125).
    """
    import optax

    cfg = config
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    t, delta, eps, omegas, x0, q_target = _setup(u_target, cfg, key)

    opt = optax.adam(learning_rate)

    def round_obj(params):  # (rounds, n_params) -> (rounds,)
        return average_infidelity(params, t, omegas, q_target, delta, eps,
                                  cfg.dt)

    @jax.jit
    def run(x0):
        def step(carry, _):
            params, opt_state = carry
            loss, g = jax.value_and_grad(
                lambda p: jnp.sum(round_obj(p)))(params)
            updates, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), _ = jax.lax.scan(
            step, (x0, opt.init(x0)), None, length=steps)
        return params, round_obj(params)

    params, infid = run(x0)
    best = int(jnp.argmin(infid))
    best_fid = 1.0 - float(infid[best])
    return ((np.asarray(params[best]), np.asarray(omegas[best])), best_fid)


# --------------------------------------------------------------------------
# JAX-native batched Nelder–Mead (derivative-free mode)
# --------------------------------------------------------------------------

def _nelder_mead_batched(f: Callable, x0: jax.Array, maxiter: int,
                         initial_step: float = 0.05,
                         xatol: float = 1e-6, fatol: float = 1e-8):
    """Vectorized Nelder–Mead: ``x0 (R, n)`` runs R independent optimizations
    in lockstep on-device.  ``f`` maps ``(R, n) -> (R,)`` batched objectives.

    Standard NM coefficients (α=1, γ=2, ρ=0.5, σ=0.5) — the same algorithm
    SciPy's default method uses in the reference (dCRAB.py:110-115).
    """
    R, n = x0.shape

    # initial simplex: x0 plus n points perturbed along coordinates
    eye = jnp.eye(n) * initial_step
    simplex = jnp.concatenate([x0[:, None, :], x0[:, None, :] + eye[None]],
                              axis=1)  # (R, n+1, n)

    def eval_simplex(s):  # (R, n+1, n) -> (R, n+1)
        return f(s.reshape(R * (n + 1), n)).reshape(R, n + 1)

    fvals = eval_simplex(simplex)

    def cond(state):
        _, fvals, it = state
        spread = jnp.max(fvals, axis=1) - jnp.min(fvals, axis=1)
        return jnp.logical_and(it < maxiter, jnp.any(spread > fatol))

    def step(state):
        simplex, fvals, it = state
        order = jnp.argsort(fvals, axis=1)
        simplex = jnp.take_along_axis(simplex, order[..., None], axis=1)
        fvals = jnp.take_along_axis(fvals, order, axis=1)

        best = simplex[:, 0]
        worst = simplex[:, -1]
        f_best = fvals[:, 0]
        f_second = fvals[:, -2]
        f_worst = fvals[:, -1]
        centroid = jnp.mean(simplex[:, :-1], axis=1)  # (R, n)

        xr = centroid + (centroid - worst)        # reflection
        fr = f(xr)
        xe = centroid + 2.0 * (centroid - worst)  # expansion
        fe = f(xe)
        xc = centroid + 0.5 * (worst - centroid)  # contraction
        fc = f(xc)

        use_expand = jnp.logical_and(fr < f_best, fe < fr)
        use_reflect = jnp.logical_and(~use_expand, fr < f_second)
        use_contract = jnp.logical_and(~use_expand,
                                       jnp.logical_and(~use_reflect,
                                                       fc < f_worst))
        shrink = ~(use_expand | use_reflect | use_contract)

        new_point = jnp.where(use_expand[:, None], xe,
                      jnp.where(use_reflect[:, None], xr,
                        jnp.where(use_contract[:, None], xc, worst)))
        new_f = jnp.where(use_expand, fe,
                  jnp.where(use_reflect, fr,
                    jnp.where(use_contract, fc, f_worst)))

        simplex = simplex.at[:, -1].set(new_point)
        fvals = fvals.at[:, -1].set(new_f)

        # shrink all-but-best toward best where needed
        shrunk = simplex[:, :1] + 0.5 * (simplex - simplex[:, :1])
        f_shrunk = eval_simplex(shrunk)
        simplex = jnp.where(shrink[:, None, None], shrunk, simplex)
        fvals = jnp.where(shrink[:, None], f_shrunk, fvals)
        return simplex, fvals, it + 1

    simplex, fvals, _ = jax.lax.while_loop(cond, step, (simplex, fvals, 0))
    ibest = jnp.argmin(fvals, axis=1)
    xbest = jnp.take_along_axis(simplex, ibest[:, None, None], axis=1)[:, 0]
    fbest = jnp.take_along_axis(fvals, ibest[:, None], axis=1)[:, 0]
    return xbest, fbest


def optimize_dcrab_nm(
    u_target,
    config: DcrabConfig = DcrabConfig(),
    maxiter: int = 1000,
    key: Optional[jax.Array] = None,
    use_scipy: bool = False,
) -> Tuple[Tuple[np.ndarray, np.ndarray], float]:
    """Derivative-free dCRAB.  JAX-native batched Nelder–Mead by default
    (all rounds advance in lockstep on-device); ``use_scipy=True`` runs
    SciPy per-round over the jitted objective (the reference's exact loop,
    dCRAB.py:91-124, with maxiter 1000).

    Scale note: Nelder–Mead is a simplex method — at the reference's headline
    configuration (N=2000 modes ⇒ 4001 parameters, dCRAB.py:134-142) a
    simplex barely moves in ``maxiter`` iterations regardless of
    implementation (the simplex itself has 4002 vertices).  At that scale use
    :func:`optimize_dcrab_grad` (15 s on one chip, BENCHMARKS.md); NM mode is
    intended for the low-dimensional regimes dCRAB is normally run in
    (N ≲ 30) and is tested there."""
    cfg = config
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    t, delta, eps, omegas, x0, q_target = _setup(u_target, cfg, key)

    if use_scipy:
        from scipy.optimize import minimize

        best_fid, best = -np.inf, None
        for rnd in range(cfg.rounds):
            obj = jax.jit(lambda p, w=omegas[rnd]: average_infidelity(
                p, t, w, q_target, delta, eps, cfg.dt))
            res = minimize(lambda p: float(obj(jnp.asarray(p, jnp.float32))),
                           np.asarray(x0[rnd]), method="Nelder-Mead",
                           options={"maxiter": maxiter})
            fid = 1.0 - float(res.fun)
            if fid > best_fid:
                best_fid = fid
                best = (res.x.copy(), np.asarray(omegas[rnd]))
        return best, best_fid

    @jax.jit
    def batched_obj(params_flat):  # (R*k, n) -> (R*k,)
        R = cfg.rounds
        k = params_flat.shape[0] // R
        p = params_flat.reshape(R, k, -1)
        infid = average_infidelity(p, t, omegas[:, None, :], q_target,
                                   delta, eps, cfg.dt)
        return infid.reshape(-1)

    xbest, fbest = _nelder_mead_batched(batched_obj, x0, maxiter)
    best = int(jnp.argmin(fbest))
    return ((np.asarray(xbest[best]), np.asarray(omegas[best])),
            1.0 - float(fbest[best]))


def dcrab_optimize(u_target, mode: str = "grad", **kwargs):
    """Front door matching the reference entry point (dCRAB.py:68-125).

    ``mode``: "grad" (default, BASELINE.json-mandated jax.grad mode) or
    "nm" (derivative-free).  Config fields pass as keyword arguments.
    """
    cfg_fields = {f.name for f in dataclasses.fields(DcrabConfig)}
    cfg = DcrabConfig(**{k: v for k, v in kwargs.items() if k in cfg_fields})
    rest = {k: v for k, v in kwargs.items() if k not in cfg_fields}
    if mode == "grad":
        return optimize_dcrab_grad(u_target, cfg, **rest)
    if mode == "nm":
        return optimize_dcrab_nm(u_target, cfg, **rest)
    raise ValueError(f"unknown mode: {mode}")
