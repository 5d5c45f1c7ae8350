"""Unit tests for sampling math vs closed forms (SURVEY.md §4 test strategy)."""
import math
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.sampling import (
    warp_time, rk4_step, euler_step,
    generate_latents, generate_latents_rk4, generate_latents_rk45,
    cfg_velocity,
)


def test_warp_time_endpoints_and_linear():
    t = jnp.linspace(0, 1, 11)
    for s in (0.25, 0.5, 1.0, 1.5):
        tw = warp_time(t, s=s)
        assert np.isclose(float(tw[0]), 0.0, atol=1e-6)
        assert np.isclose(float(tw[-1]), 1.0, atol=1e-6)
    # s=1 is exactly linear
    np.testing.assert_allclose(np.asarray(warp_time(t, s=1.0)), np.asarray(t), atol=1e-6)


def test_warp_time_derivative_matches_finite_diff():
    t = jnp.linspace(0.05, 0.95, 7)
    eps = 1e-4
    tw, dtw = warp_time(t, dt=1.0, s=0.5)
    fd = (warp_time(t + eps, s=0.5) - warp_time(t - eps, s=0.5)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dtw), np.asarray(fd), rtol=1e-3)


def test_warp_time_cosine_approx():
    # s=1.5 ≈ sin^2(pi/2 * t) (reference docstring sampling.py:28)
    t = jnp.linspace(0, 1, 21)
    tw = warp_time(t, s=1.5)
    cos_sched = jnp.sin(jnp.pi / 2 * t) ** 2
    assert float(jnp.max(jnp.abs(tw - cos_sched))) < 0.02


def test_warp_time_bounds():
    with pytest.raises(ValueError):
        warp_time(jnp.array([0.5]), s=2.0)


def test_rk4_exponential_decay():
    # dy/dt = -y, y(0)=1 -> y(1)=e^-1; RK4 with 10 steps should be ~1e-6 accurate
    f = lambda y, t: -y
    y = jnp.ones(())
    ts = jnp.linspace(0, 1, 11)
    for i in range(10):
        y = rk4_step(f, y, ts[i], ts[i + 1] - ts[i])
    assert abs(float(y) - np.exp(-1)) < 1e-6


def test_euler_vs_rk4_order():
    f = lambda y, t: -y
    y_e = y_r = jnp.ones(())
    ts = jnp.linspace(0, 1, 11)
    for i in range(10):
        y_e = euler_step(f, y_e, ts[i], ts[i + 1] - ts[i])
        y_r = rk4_step(f, y_r, ts[i], ts[i + 1] - ts[i])
    exact = np.exp(-1)
    assert abs(float(y_r) - exact) < abs(float(y_e) - exact)


def _linear_field(x, t_vec, cond):
    # v(x,t) = target - x0 is constant for straight paths; use v = 1-2x so the
    # ODE has a known fixed point at 0.5
    return 0.5 - x


def test_generate_latents_converges_to_fixed_point():
    rng = jax.random.PRNGKey(0)
    x, nfe = generate_latents_rk4(_linear_field, (4, 2, 2, 3), rng, n_steps=40,
                                  cond=None, cfg_strength=0.0, t_scale=1.0)
    # dx/dt = 0.5 - x from x0~N(0,1) over t in [0,1]: x(1) = 0.5 + (x0-0.5)e^-1
    assert x.shape == (4, 2, 2, 3)
    assert nfe == 39 * 4


def test_rk45_matches_rk4_on_smooth_field():
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.normal(rng, (2, 2, 2, 1))
    x4, _ = generate_latents_rk4(_linear_field, x0.shape, rng, n_steps=60,
                                 source=x0, cfg_strength=0.0, t_scale=1.0,
                                 warp_s=1.0)
    x45, nfe = generate_latents_rk45(_linear_field, x0.shape, rng, source=x0,
                                     cfg_strength=0.0, t_scale=1.0)
    np.testing.assert_allclose(np.asarray(x4), np.asarray(x45), atol=1e-3)
    assert int(nfe) > 0


def test_second_order_steps_order_and_accuracy():
    """Heun/midpoint sit between Euler and RK4 on dy/dt=-y, and both are
    2nd order (error ratio ~4 when halving dt)."""
    from flocoder_tpu.sampling import heun_step, midpoint_step
    f = lambda y, t: -y
    exact = np.exp(-1)

    def integrate(step, n):
        y = jnp.ones(())
        ts = jnp.linspace(0, 1, n + 1)
        for i in range(n):
            y = step(f, y, ts[i], ts[i + 1] - ts[i])
        return float(y)

    for step in (heun_step, midpoint_step):
        err_e = abs(integrate(euler_step, 10) - exact)
        err_2 = abs(integrate(step, 10) - exact)
        err_4 = abs(integrate(rk4_step, 10) - exact)
        assert err_4 < err_2 < err_e
        # 2nd order: halving dt cuts error ~4x
        ratio = abs(integrate(step, 10) - exact) / \
            abs(integrate(step, 20) - exact)
        assert 3.0 < ratio < 5.0


def test_generate_latents_dispatch():
    rng = jax.random.PRNGKey(2)
    for method in ("rk4", "euler", "heun", "midpoint", "ab4", "rk45"):
        x, nfe = generate_latents(_linear_field, (2, 2, 2, 1), rng,
                                  method=method, n_steps=10,
                                  cfg_strength=0.0, t_scale=1.0)
        assert x.shape == (2, 2, 2, 1)
        if method in ("heun", "midpoint"):
            assert int(nfe) == 9 * 2
        if method == "ab4":
            assert int(nfe) == 12 + (9 - 3)


def test_ab4_exact_on_cubic_velocity():
    """AB4 integrates any x-independent velocity that is cubic in t EXACTLY
    (the 4-point interpolation is the integrand), even on the warped
    non-uniform grid — this pins the variable-step coefficient solve
    (sampling._ab4_coefficients)."""
    from flocoder_tpu.sampling import generate_latents_ab4

    def v(x, t_vec, cond):
        t = t_vec[0].astype(jnp.float64) if t_vec.dtype == jnp.float64 \
            else t_vec[0]
        return jnp.ones_like(x) * (2.0 - 3.0 * t + 4.0 * t ** 2 + t ** 3)

    # exact integral over [0,1]: 2 - 3/2 + 4/3 + 1/4
    exact = 2.0 - 1.5 + 4.0 / 3.0 + 0.25
    rng = jax.random.PRNGKey(0)
    x, nfe = generate_latents_ab4(v, (2, 4, 4, 1), rng, n_steps=12,
                                  cfg_strength=0.0, t_scale=1.0,
                                  warp_s=0.5)
    x0 = jax.random.normal(jax.random.split(rng)[0], (2, 4, 4, 1),
                           jnp.float32)
    err = float(jnp.max(jnp.abs(x - x0 - exact)))
    assert err < 5e-5, err
    assert int(nfe) == 12 + (11 - 3)


def test_ab4_order_on_exponential_decay():
    """On dx/dt = -x, AB4 must beat Heun at equal steps and approach the
    RK4 answer; halving dt should cut the error ~16x (4th order)."""
    from flocoder_tpu.sampling import generate_latents_ab4, \
        generate_latents_second_order

    def v(x, t_vec, cond):
        return -x

    exact = math.exp(-1.0)

    def run(fn, n, **kw):
        rng = jax.random.PRNGKey(1)
        x, _ = fn(v, (1, 2, 2, 1), rng, n_steps=n, cfg_strength=0.0,
                  t_scale=1.0, warp_s=1.0, **kw)
        x0 = jax.random.normal(jax.random.split(rng)[0], (1, 2, 2, 1),
                               jnp.float32)
        return float(jnp.mean(x / x0))

    err_ab_10 = abs(run(generate_latents_ab4, 11) - exact)
    err_ab_20 = abs(run(generate_latents_ab4, 21) - exact)
    err_heun = abs(run(generate_latents_second_order, 11) - exact)
    assert err_ab_10 < err_heun
    ratio = err_ab_10 / max(err_ab_20, 1e-12)
    assert ratio > 8.0, (err_ab_10, err_ab_20)  # ≥~4th-order shrinkage


def test_ab4_small_grid_falls_back_to_rk4():
    from flocoder_tpu.sampling import generate_latents_ab4

    def v(x, t_vec, cond):
        return -x

    x, nfe = generate_latents_ab4(v, (1, 2, 2, 1), jax.random.PRNGKey(0),
                                  n_steps=3, cfg_strength=0.0, t_scale=1.0)
    assert int(nfe) == 2 * 4
    assert bool(jnp.isfinite(x).all())


def test_cfg_velocity_mixing():
    # model returns class-dependent constant: v = 1 for class>=0 tokens, 0 for null
    def apply_fn(x, t_vec, cond):
        cc = cond["class_cond"]
        return jnp.where((cc >= 0)[:, None, None, None],
                         jnp.ones_like(x), jnp.zeros_like(x))

    cond = {"class_cond": jnp.zeros((3,), jnp.int32)}
    f = cfg_velocity(apply_fn, cond, cfg_strength=3.0, t_scale=1.0)
    v = f(jnp.zeros((3, 2, 2, 1)), jnp.asarray(0.5))
    # v = v_u + w (v_c - v_u) = 0 + 3*(1-0) = 3
    np.testing.assert_allclose(np.asarray(v), 3.0, atol=1e-6)


def test_cfg_no_class_single_eval():
    calls = []

    def apply_fn(x, t_vec, cond):
        calls.append(x.shape[0])
        return jnp.zeros_like(x)

    f = cfg_velocity(apply_fn, None, cfg_strength=3.0, t_scale=1.0)
    f(jnp.zeros((4, 2, 2, 1)), jnp.asarray(0.1))
    assert calls == [4]  # no batch doubling without class cond


def test_init_latents_path():
    rng = jax.random.PRNGKey(3)
    init = jnp.full((2, 2, 2, 1), 0.7)
    x, nfe = generate_latents_rk4(_linear_field, init.shape, rng, n_steps=20,
                                  init_latents=init, init_strength=0.9,
                                  cfg_strength=0.0, t_scale=1.0)
    # starting near the init point and integrating only over [0.9, 1]
    assert x.shape == init.shape
    assert nfe < 20 * 4  # fewer steps since init_strength shrinks the grid


def test_sde_zero_noise_reduces_to_euler():
    """noise_scale=0 must make the SDE sampler bit-identical to the Euler
    probability-flow sampler (same grid, drift collapses to v)."""
    from flocoder_tpu.sampling import (generate_latents_euler,
                                       generate_latents_sde)
    rng = jax.random.PRNGKey(5)
    xe, ne = generate_latents_euler(_linear_field, (4, 2, 2, 1), rng,
                                    n_steps=30, cfg_strength=0.0, t_scale=1.0)
    xs, ns = generate_latents_sde(_linear_field, (4, 2, 2, 1), rng,
                                  n_steps=30, cfg_strength=0.0, t_scale=1.0,
                                  noise_scale=0.0)
    assert ns == ne
    np.testing.assert_array_equal(np.asarray(xe), np.asarray(xs))


def test_sde_preserves_gaussian_marginals():
    """Marginal-preservation: for the analytic rectified-flow velocity of an
    independent Gaussian→Gaussian coupling (x0~N(0,1), x1~N(μ,σ²)), the SDE
    dx = [v + g²/2·s]dt + g dW with the velocity-derived score
    s = (t·v − x)/(1−t) must land on N(μ, σ²) at t=1 for ANY churn level —
    the diffusion sampler draws from the same model distribution as the ODE
    (sampling.py:generate_latents_sde derivation)."""
    from flocoder_tpu.sampling import generate_latents_sde
    mu, sig = 1.5, 0.6

    def v_exact(x, t_vec, cond):
        t = t_vec[:, None, None, None]
        var_t = (1 - t) ** 2 + (t * sig) ** 2
        return mu + ((t * sig * sig - (1 - t)) / var_t) * (x - t * mu)

    for noise_scale in (0.0, 0.8):
        x, nfe = generate_latents_sde(
            v_exact, (8192, 1, 1, 1), jax.random.PRNGKey(11), n_steps=300,
            cfg_strength=0.0, t_scale=1.0, warp_s=None,
            noise_scale=noise_scale)
        assert nfe == 299
        m, s = float(jnp.mean(x)), float(jnp.std(x))
        assert abs(m - mu) < 0.05, (noise_scale, m)
        assert abs(s - sig) < 0.05, (noise_scale, s)


def test_sde_dispatch_and_stochasticity():
    """method='sde' dispatches; two different keys give different samples
    (it IS stochastic), same key reproduces."""
    from flocoder_tpu.sampling import generate_latents
    x1, _ = generate_latents(_linear_field, (2, 2, 2, 1),
                             jax.random.PRNGKey(0), method="sde", n_steps=10,
                             cfg_strength=0.0, t_scale=1.0)
    x1b, _ = generate_latents(_linear_field, (2, 2, 2, 1),
                              jax.random.PRNGKey(0), method="sde", n_steps=10,
                              cfg_strength=0.0, t_scale=1.0)
    x2, _ = generate_latents(_linear_field, (2, 2, 2, 1),
                             jax.random.PRNGKey(1), method="sde", n_steps=10,
                             cfg_strength=0.0, t_scale=1.0)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x1b))
    assert float(jnp.abs(x1 - x2).max()) > 1e-6
