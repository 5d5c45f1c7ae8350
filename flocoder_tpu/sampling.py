"""ODE sampling for latent flow matching — TPU-native integrators.

Reference behavior: flocoder/sampling.py (warp_time :23, rk4_step :37,
v_func_cfg :51, generate_latents_rk4 :79, generate_latents :127, sampler :186).

TPU-first redesign, not a translation:

- The whole integration is ONE jitted ``lax.scan`` over a precomputed (warped)
  time grid, with the velocity-field evaluation fused into the step update.
  The reference runs a Python loop with a forced host sync per step
  (sampling.py:64-67, a CUDA-memory workaround) — we deliberately drop that.
- Classifier-free guidance evaluates cond+uncond in a single batched forward
  (concat on batch axis → one big MXU-friendly matmul pass) instead of the
  reference's two sequential model calls (sampling.py:69-74).
- Adaptive RK45 (Dormand–Prince) runs on-device via ``lax.while_loop`` —
  closing the reference's known gap ("Make RK4(5) integrator fully
  CUDA-compatible", reference README.md:146; its scipy RK45 was CPU-only and
  removed, sampling.py:4,142).
- Stochastic jitter uses explicit ``jax.random`` keys instead of Python RNG
  (sampling.py:118-119).

All arrays are NHWC.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "warp_time",
    "euler_step",
    "rk4_step",
    "heun_step",
    "midpoint_step",
    "cfg_velocity",
    "generate_latents_rk4",
    "generate_latents_euler",
    "generate_latents_sde",
    "generate_latents_meanflow",
    "generate_latents_second_order",
    "generate_latents_ab4",
    "generate_latents_rk45",
    "generate_latents",
]


def warp_time(t, dt=None, s: float = 0.5):
    """Parametric time warp (reference: sampling.py:23-33).

    ``tw = 4(1-s)t^3 + 6(s-1)t^2 + (3-2s)t``; s=1 linear, s<1 slower middle,
    s>1 slower ends; s=1.5 ≈ cosine schedule. If ``dt`` is given, also returns
    the warped step via the analytic derivative.
    """
    if s < 0 or s > 1.5:
        raise ValueError(f"s={s} is out of bounds [0, 1.5].")
    t = jnp.asarray(t)
    tw = 4 * (1 - s) * t**3 + 6 * (s - 1) * t**2 + (3 - 2 * s) * t
    if dt is not None:
        deriv = 12 * (1 - s) * t**2 + 12 * (s - 1) * t + (3 - 2 * s)
        return tw, dt * deriv
    return tw


def euler_step(f: Callable, y, t, dt):
    """Single forward-Euler step (reference: legacy/train_sd_flowers.py:50-67)."""
    return y + dt * f(y, t)


def rk4_step(f: Callable, y, t, dt):
    """Classic RK4 step (reference: sampling.py:37-48)."""
    k1 = f(y, t)
    k2 = f(y + dt * k1 / 2, t + dt / 2)
    k3 = f(y + dt * k2 / 2, t + dt / 2)
    k4 = f(y + dt * k3, t + dt)
    return y + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)


def heun_step(f: Callable, y, t, dt):
    """Heun (explicit trapezoid) step — 2 NFE, 2nd order. Not in the
    reference (its samplers are Euler/RK4/scipy-RK45); added because the
    serving sampler is NFE-bound (docs/BENCH_NOTES.md): half RK4's model
    evals per step at the same order count as flow-matching paths are
    near-straight after OT pairing."""
    k1 = f(y, t)
    k2 = f(y + dt * k1, t + dt)
    return y + (dt / 2) * (k1 + k2)


def midpoint_step(f: Callable, y, t, dt):
    """Explicit midpoint step — 2 NFE, 2nd order (see heun_step)."""
    k1 = f(y, t)
    return y + dt * f(y + (dt / 2) * k1, t + dt / 2)


def cfg_velocity(apply_fn: Callable, cond: Optional[dict], cfg_strength: float,
                 t_scale: float = 999.0) -> Callable:
    """Build a velocity function ``f(x, t) -> v`` with classifier-free guidance.

    ``apply_fn(x, t_vec, cond)`` is the model forward (params already bound).
    With class conditioning active and ``cfg_strength`` nonzero, cond and
    uncond branches are evaluated in ONE forward by concatenating along the
    batch axis, then mixed as ``v = v_u + w * (v_c - v_u)``
    (reference: sampling.py:51-76).
    """
    has_class = cond is not None and cond.get("class_cond") is not None
    use_cfg = has_class and cfg_strength is not None and cfg_strength != 0

    if not use_cfg:
        def f(x, t):
            t_vec = jnp.full((x.shape[0],), t, dtype=x.dtype) * t_scale
            return apply_fn(x, t_vec, cond)
        return f

    def f(x, t):
        b = x.shape[0]
        t_vec = jnp.full((2 * b,), t, dtype=x.dtype) * t_scale
        x2 = jnp.concatenate([x, x], axis=0)
        cond2 = dict(cond)
        cond2["class_cond"] = jnp.concatenate(
            [cond["class_cond"], jnp.full_like(cond["class_cond"], -1)], axis=0)
        if cond.get("mask_cond") is not None:
            cond2["mask_cond"] = jnp.concatenate(
                [cond["mask_cond"], cond["mask_cond"]], axis=0)
        if cond.get("time_horizon") is not None:
            # dual-time (MeanFlow) models: the horizon doubles with the batch
            cond2["time_horizon"] = jnp.concatenate(
                [cond["time_horizon"], cond["time_horizon"]], axis=0)
        v2 = apply_fn(x2, t_vec, cond2)
        v_c, v_u = v2[:b], v2[b:]
        return v_u + cfg_strength * (v_c - v_u)

    return f


def _time_grid(n_steps: int, init_strength: float, warp_s: float, dtype):
    """Warped integration grid t ∈ [init_strength, 1]
    (reference: sampling.py:101-111). Reference-faithful subtlety: the warp
    is applied AFTER the grid starts at init_strength, so the first eval
    time is warp_time(init_strength) while the init blend is constructed at
    t = init_strength (exactly what the reference does at :109-111);
    pass warp_s=None for a self-consistent uniform img2img grid."""
    if init_strength > 0:
        n_steps = max(1, int(n_steps * (1.0 - init_strength)))
    ts = jnp.linspace(init_strength, 1.0, n_steps, dtype=dtype)
    if warp_s is not None:
        ts = warp_time(ts, s=warp_s)
    return ts


def _integrate_scan(step_fn: Callable, v_func: Callable, x0, ts,
                    jitter_strength: float = 0.0, rng: Optional[jax.Array] = None):
    """Scan a one-step integrator over a time grid; jitter optionally added
    with probability 0.1 per step, decaying as (1 - t)
    (reference: sampling.py:116-119)."""
    n = ts.shape[0] - 1
    use_jitter = jitter_strength > 0 and rng is not None
    keys = jax.random.split(rng, n) if use_jitter else jnp.zeros((n, 2), dtype=jnp.uint32)

    def body(x, inp):
        t0, t1, key = inp
        x = step_fn(v_func, x, t0, t1 - t0)
        if use_jitter:
            k_gate, k_noise = jax.random.split(key)
            gate = jax.random.uniform(k_gate) < 0.1
            noise = jax.random.normal(k_noise, x.shape, x.dtype)
            x = x + gate * noise * jitter_strength * (1 - t0)
        return x, None

    x_final, _ = jax.lax.scan(body, x0, (ts[:-1], ts[1:], keys))
    return x_final


def generate_latents_rk4(apply_fn: Callable, shape, rng: jax.Array,
                         n_steps: int = 50, cond: Optional[dict] = None,
                         cfg_strength: float = 3.0, source=None,
                         init_latents=None, init_strength: float = 0.0,
                         jitter_strength: float = 0.0, t_scale: float = 999.0,
                         warp_s: float = 0.5, dtype=jnp.float32):
    """RK4 integration from noise (or source/init-latents) to data
    (reference: sampling.py:79-122). Returns ``(latents, nfe)``.

    ``apply_fn(x, t_vec, cond)`` must be a pure function of its inputs; the
    scan is jit-compatible and meant to be wrapped in ``jax.jit``/``pjit`` by
    the caller (see ``make_sampler``).
    """
    k_init, k_jitter = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape, dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
        jitter_strength = 0.0
    ts = _time_grid(n_steps, init_strength, warp_s, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)
    x = _integrate_scan(rk4_step, v_func, x0, ts, jitter_strength, k_jitter)
    nfe = (ts.shape[0] - 1) * 4
    return x, nfe


def generate_latents_euler(apply_fn: Callable, shape, rng: jax.Array,
                           n_steps: int = 100, cond: Optional[dict] = None,
                           cfg_strength: float = 3.0, source=None,
                           init_latents=None, init_strength: float = 0.0,
                           t_scale: float = 999.0, warp_s: float = 0.5,
                           dtype=jnp.float32):
    """Euler integration (reference: legacy/train_sd_flowers.py:50-67, with the
    live repo's time-warp grid applied). Returns ``(latents, nfe)``."""
    k_init, _ = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape, dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
    ts = _time_grid(n_steps, init_strength, warp_s, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)
    x = _integrate_scan(euler_step, v_func, x0, ts)
    return x, ts.shape[0] - 1


def generate_latents_sde(apply_fn: Callable, shape, rng: jax.Array,
                         n_steps: int = 100, cond: Optional[dict] = None,
                         cfg_strength: float = 3.0, source=None,
                         init_latents=None, init_strength: float = 0.0,
                         t_scale: float = 999.0, warp_s: float = 0.5,
                         noise_scale: float = 0.8, dtype=jnp.float32):
    """Diffusion-style stochastic sampler from the SAME trained flow
    (closes the reference's README.md:148 TODO "Add jitter / diffusion for
    comparison"). Returns ``(latents, nfe)``; 1 NFE per step.

    For the linear path x_t = (1−t)·x0 + t·x1 with Gaussian source, the
    marginal score is recoverable from the learned velocity:
    E[x0|x_t] = x − t·v  ⇒  s(x,t) = ∇log p_t(x) = (t·v − x)/(1−t).
    Any SDE  dx = [v + g(t)²/2 · s] dt + g(t) dW  then shares the ODE's
    marginals; with churn schedule g(t) = noise_scale·(1−t) the drift
    correction g²/2·s = noise_scale²·(1−t)·(t·v − x)/2 is division-free
    (bounded as t→1), and ``noise_scale=0`` reduces EXACTLY to the Euler
    probability-flow sampler. Integration is Euler–Maruyama over the same
    warped grid as the ODE samplers."""
    k_init, k_noise = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape,
                                                             dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
    ts = _time_grid(n_steps, init_strength, warp_s, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)
    n = ts.shape[0] - 1
    keys = jax.random.split(k_noise, n)
    g2_half = 0.5 * noise_scale * noise_scale

    def body(x, inp):
        t0, t1, key = inp
        dt = t1 - t0
        v = v_func(x, t0)
        drift = v + g2_half * (1 - t0) * (t0 * v - x)
        x = x + drift * dt
        if noise_scale > 0:
            xi = jax.random.normal(key, x.shape, x.dtype)
            x = x + noise_scale * (1 - t0) * jnp.sqrt(dt) * xi
        return x, None

    x, _ = jax.lax.scan(body, x0, (ts[:-1], ts[1:], keys))
    return x, n


def generate_latents_meanflow(apply_fn: Callable, shape, rng: jax.Array,
                              n_steps: int = 1, cond: Optional[dict] = None,
                              cfg_strength: float = 0.0, source=None,
                              init_latents=None, init_strength: float = 0.0,
                              t_scale: float = 999.0, warp_s: float = None,
                              dtype=jnp.float32):
    """Few-step sampling with an AVERAGE-velocity (MeanFlow) model — the
    one-step generation the reference's README.md:158 research TODO points
    at. Requires a dual-time model (``Unet(dual_time=True)``) trained with
    ``flow.meanflow=true``; u(x, r, t) is the mean velocity over [r, t], so
    each segment is EXACT (not an Euler approximation of v):

        x_{t_{k+1}} = x_{t_k} + (t_{k+1} − t_k) · u(x_{t_k}, t_k, t_{k+1})

    ``n_steps=1`` is genuine 1-NFE generation: x1 = x0 + u(x0, 0, 1).
    Returns ``(latents, nfe)`` with nfe = n_steps (× 2 under CFG). The
    default grid is uniform (warp_s=None): the time-warp targets
    integration-error clustering that an exact average-velocity step does
    not have."""
    k_init, _ = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape,
                                                             dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
    ts = _time_grid(max(n_steps + 1, 2), init_strength, warp_s, dtype)
    base = dict(cond) if cond else {}

    def body(x, inp):
        t0, t1 = inp
        c = dict(base)
        c["time_horizon"] = jnp.full((x.shape[0],), t1, x.dtype) * t_scale
        u = cfg_velocity(apply_fn, c, cfg_strength, t_scale)(x, t0)
        return x + (t1 - t0) * u, None

    x, _ = jax.lax.scan(body, x0, (ts[:-1], ts[1:]))
    return x, int(ts.shape[0] - 1)


def generate_latents_second_order(apply_fn: Callable, shape, rng: jax.Array,
                                  n_steps: int = 25,
                                  cond: Optional[dict] = None,
                                  cfg_strength: float = 3.0, source=None,
                                  init_latents=None,
                                  init_strength: float = 0.0,
                                  t_scale: float = 999.0, warp_s: float = 0.5,
                                  dtype=jnp.float32, kind: str = "heun"):
    """Heun/midpoint integration — 2 NFE per step (vs RK4's 4) at 2nd order,
    for the NFE-bound serving path. Returns ``(latents, nfe)``."""
    step = heun_step if kind == "heun" else midpoint_step
    k_init, _ = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape,
                                                             dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
    ts = _time_grid(n_steps, init_strength, warp_s, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)
    x = _integrate_scan(step, v_func, x0, ts)
    return x, (ts.shape[0] - 1) * 2


def _ab4_coefficients(ts):
    """Variable-step 4th-order Adams–Bashforth weights for a (warped,
    non-uniform) grid. For each step i ≥ 3, returns the weights c s.t.
    ``x_{i+1} = x_i + Σ_j c_j · f(t_{i-3+j})`` — the integral over
    [t_i, t_{i+1}] of the cubic interpolating f at {t_{i-3..i}}. On a
    uniform grid this reduces to the classic (−9, 37, −59, 55)·h/24.
    Solved as a batched 4×4 Vandermonde moment system, shifted to t_i for
    conditioning. Shape: (n_intervals − 3, 4), oldest → newest."""
    n = ts.shape[0] - 1  # intervals
    idx = jnp.arange(3, n)
    # node times relative to t_i: (m, 4)
    tau = jnp.stack([ts[idx - 3], ts[idx - 2], ts[idx - 1], ts[idx]],
                    axis=1) - ts[idx][:, None]
    dt1 = (ts[idx + 1] - ts[idx])[:, None]            # (m, 1)
    k = jnp.arange(4)[None, :]                         # (1, 4)
    # Vandermonde V[m, k, j] = tau_j^k ; moments m_k = dt1^{k+1}/(k+1)
    vand = tau[:, None, :] ** jnp.arange(4)[None, :, None]
    moments = dt1 ** (k + 1) / (k + 1)                 # (m, 4)
    return jnp.linalg.solve(vand, moments[..., None])[..., 0]


def generate_latents_ab4(apply_fn: Callable, shape, rng: jax.Array,
                         n_steps: int = 25, cond: Optional[dict] = None,
                         cfg_strength: float = 3.0, source=None,
                         init_latents=None, init_strength: float = 0.0,
                         t_scale: float = 999.0, warp_s: float = 0.5,
                         dtype=jnp.float32):
    """4th-order Adams–Bashforth linear multistep integration — ONE model
    eval per step after a 3-step RK4 bootstrap (whose k1 evals double as the
    stored grid velocities, so the bootstrap adds no extra NFE).

    Not in the reference (its samplers are Euler/RK4/scipy-RK45;
    sampling.py:127-146). This is the PLMS idea from pseudo-numerical
    diffusion samplers applied to flow matching: the serving path is
    NFE-bound (docs/BENCH_NOTES.md) and OT-paired flow trajectories are
    near-straight, so a multistep method keeps 4th-order accuracy at ¼ of
    RK4's evals. Weights are recomputed per step for the warped
    (non-uniform) time grid — see ``_ab4_coefficients``.

    NFE = 12 (bootstrap) + (n_intervals − 3). Returns ``(latents, nfe)``.
    Falls back to plain RK4 when the grid has < 5 points."""
    k_init, _ = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape,
                                                             dtype)
    if init_latents is not None:
        x0 = (1 - init_strength) * x0 + init_strength * init_latents
    else:
        init_strength = 0.0
    ts = _time_grid(n_steps, init_strength, warp_s, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)
    n = ts.shape[0] - 1
    if n < 4:
        x = _integrate_scan(rk4_step, v_func, x0, ts)
        return x, n * 4

    # Bootstrap x_0 → x_3 with RK4; k1 of each step IS f(x_i, t_i), so the
    # multistep history comes for free.
    x = x0
    hist = []
    for i in range(3):
        t0, dt = ts[i], ts[i + 1] - ts[i]
        k1 = v_func(x, t0)
        k2 = v_func(x + dt * k1 / 2, t0 + dt / 2)
        k3 = v_func(x + dt * k2 / 2, t0 + dt / 2)
        k4 = v_func(x + dt * k3, t0 + dt)
        hist.append(k1)
        x = x + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
    f_hist = jnp.stack(hist)  # (3, *shape): f at t_0, t_1, t_2

    coeffs = _ab4_coefficients(ts).astype(dtype)  # (n-3, 4)

    def body(carry, inp):
        x, fh = carry
        t_i, c = inp
        f_i = v_func(x, t_i)
        fs = jnp.concatenate([fh, f_i[None]], axis=0)       # (4, *shape)
        x = x + jnp.tensordot(c, fs, axes=1)
        return (x, fs[1:]), None

    (x, _), _ = jax.lax.scan(body, (x, f_hist), (ts[3:-1], coeffs))
    nfe = 12 + (n - 3)
    return x, nfe


# Dormand–Prince RK45 Butcher tableau.
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def generate_latents_rk45(apply_fn: Callable, shape, rng: jax.Array,
                          cond: Optional[dict] = None, cfg_strength: float = 3.0,
                          source=None, rtol: float = 1e-3, atol: float = 1e-4,
                          max_steps: int = 1000, t_scale: float = 999.0,
                          dtype=jnp.float32):
    """Adaptive Dormand–Prince RK45 integration on device via
    ``lax.while_loop`` — the fully-on-device adaptive solver the reference
    lacked (reference README.md:146 TODO; its scipy version at
    legacy/train_sd_flowers.py:78-105 ran on CPU). A single scalar step size is
    controlled by the max error norm over the batch (static shapes, no host
    sync). Returns ``(latents, nfe)`` where nfe counts actual model evals."""
    k_init, _ = jax.random.split(rng)
    x0 = source if source is not None else jax.random.normal(k_init, shape, dtype)
    v_func = cfg_velocity(apply_fn, cond, cfg_strength, t_scale)

    def dp_step(x, t, dt):
        ks = []
        for i in range(7):
            xi = x
            for j, a in enumerate(_DP_A[i]):
                xi = xi + dt * a * ks[j]
            ks.append(v_func(xi, t + _DP_C[i] * dt))
        x5 = x
        x4 = x
        for i in range(7):
            x5 = x5 + dt * _DP_B5[i] * ks[i]
            x4 = x4 + dt * _DP_B4[i] * ks[i]
        err = x5 - x4
        return x5, err

    def err_norm(err, x_old, x_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(x_old), jnp.abs(x_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def cond_fn(state):
        _, t, _, steps, _ = state
        return jnp.logical_and(t < 1.0, steps < max_steps)

    def body_fn(state):
        x, t, dt, steps, nfe = state
        dt = jnp.minimum(dt, 1.0 - t)
        x_new, err = dp_step(x, t, dt)
        norm = err_norm(err, x, x_new)
        accept = norm <= 1.0
        factor = jnp.clip(0.9 * jnp.where(norm > 0, norm, 1e-10) ** (-0.2), 0.2, 5.0)
        dt_next = jnp.clip(dt * factor, 1e-5, 1.0)
        x = jnp.where(accept, x_new, x)
        t = jnp.where(accept, t + dt, t)
        return (x, t, dt_next, steps + 1, nfe + 6)  # FSAL not exploited; 7 evals, 1 shared

    init_dt = jnp.asarray(0.05, dtype)
    x, t, _, steps, nfe = jax.lax.while_loop(
        cond_fn, body_fn, (x0, jnp.asarray(0.0, dtype), init_dt,
                           jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)))
    return x, nfe


def generate_latents(apply_fn: Callable, shape, rng: jax.Array,
                     method: str = "rk4", n_steps: int = 50,
                     cond: Optional[dict] = None, cfg_strength: float = 3.0,
                     source=None, init_latents=None, init_strength: float = 0.0,
                     t_scale: float = 999.0, warp_s: float = 0.5,
                     dtype=jnp.float32):
    """Dispatch by method ∈ {'rk4', 'euler', 'heun', 'midpoint', 'ab4',
    'rk45', 'sde', 'meanflow'} (reference: sampling.py:127-146 — whose
    'rk45' branch called a removed function; here it works; heun/midpoint/
    ab4 are NFE-efficient additions, 'sde' the diffusion-comparison sampler
    from README.md:148, 'meanflow' the 1-NFE average-velocity sampler from
    README.md:158 — dual-time models only). ``warp_s``: time-warp slope
    (reference sampling.py:23-33; 0.5 = the default cubic warp, None =
    uniform grid)."""
    common = dict(cond=cond, cfg_strength=cfg_strength, source=source,
                  t_scale=t_scale, dtype=dtype)
    if method == "rk45":
        # adaptive: no fixed time grid, so the warp doesn't apply
        return generate_latents_rk45(apply_fn, shape, rng, **common)
    common["warp_s"] = warp_s
    if method == "meanflow":
        # dual-time (average-velocity) model, 1 NFE per segment; n_steps
        # here means SEGMENTS (n_steps=1 → one-step generation)
        return generate_latents_meanflow(apply_fn, shape, rng,
                                         n_steps=n_steps,
                                         init_latents=init_latents,
                                         init_strength=init_strength,
                                         **common)
    if method == "sde":
        return generate_latents_sde(apply_fn, shape, rng, n_steps=n_steps,
                                    init_latents=init_latents,
                                    init_strength=init_strength, **common)
    if method == "ab4":
        return generate_latents_ab4(apply_fn, shape, rng, n_steps=n_steps,
                                    init_latents=init_latents,
                                    init_strength=init_strength, **common)
    if method in ("heun", "midpoint"):
        return generate_latents_second_order(
            apply_fn, shape, rng, n_steps=n_steps, init_latents=init_latents,
            init_strength=init_strength, kind=method, **common)
    if method == "euler":
        return generate_latents_euler(apply_fn, shape, rng, n_steps=n_steps,
                                      init_latents=init_latents,
                                      init_strength=init_strength, **common)
    return generate_latents_rk4(apply_fn, shape, rng, n_steps=n_steps,
                                init_latents=init_latents,
                                init_strength=init_strength, **common)
