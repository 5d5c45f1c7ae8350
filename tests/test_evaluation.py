"""sampler / evaluate_model / decode_latents orchestration tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.evaluation import (decode_latents, sampler, evaluate_model,
                                     make_e2e_sampler)
from flocoder_tpu.models.codecs import NoOpAE, SimpleResizeAE


def _vel_field(x, t, cond):
    return 0.5 - x  # fixed point at 0.5


def test_decode_latents_chunked_matches_unchunked():
    codec = SimpleResizeAE(latent_shape=(4, 4, 3), image_size=8)
    lat = jax.random.normal(jax.random.PRNGKey(0), (10, 4, 4, 3))
    full = decode_latents(codec, {}, lat, chunk_size=100)
    chunked = decode_latents(codec, {}, lat, chunk_size=3)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-6)


def test_decode_latents_midi_g2rgb():
    codec = NoOpAE(in_channels=1)
    lat = jnp.ones((2, 4, 4, 1)) * 0.5  # gray 0.5 → green channel
    out = decode_latents(codec, {}, lat, is_midi=True)
    assert out.shape == (2, 4, 4, 3)
    assert float(out[..., 1].max()) == 1.0  # sustain → green


def test_sampler_shapes_and_class_grid():
    codec = NoOpAE()
    lat, dec, nfe = sampler(_vel_field, codec, {}, jax.random.PRNGKey(0),
                            batch_size=12, n_steps=5, n_classes=7,
                            latent_shape=(4, 4, 3), cfg_strength=0.0,
                            cond=None)
    assert lat.shape == (12, 4, 4, 3)
    assert dec.shape == (12, 4, 4, 3)
    assert nfe == 4 * 4


def test_evaluate_model_end_to_end(tmp_path):
    codec = NoOpAE()
    target = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 3)) * 0.1 + 0.5
    metrics = evaluate_model(_vel_field, codec, {}, epoch=1,
                             target_latents=target,
                             rng=jax.random.PRNGKey(2), batch_size=16,
                             n_steps=5, method="rk4", cfg_strength=0.0,
                             use_wandb=False, output_dir=str(tmp_path))
    for key in ("FID_px", "sinkhorn", "mse", "pred_mean", "targ_std"):
        assert key in metrics and np.isfinite(metrics[key])
    # image grids written
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) >= 4  # pred/target latents + decodes


def test_make_e2e_sampler_jitted():
    codec = SimpleResizeAE(latent_shape=(4, 4, 3), image_size=8)
    f = make_e2e_sampler(lambda p, x, t, c: 0.5 - x, codec, (4, 4, 3),
                         batch_size=6, n_steps=4, cfg_strength=0.0,
                         n_classes=0)
    lat, img = f({}, {}, jax.random.PRNGKey(0), jnp.zeros(6, jnp.int32))
    assert lat.shape == (6, 4, 4, 3)
    assert img.shape == (6, 8, 8, 3)
    # fixed point pull: mean should move toward 0.5
    assert abs(float(lat.mean()) - 0.5) < 0.5


def test_sampler_fused_params_path_matches_legacy():
    """sampler(params=...) routes through the cached fused executable and
    must produce the same latents/images as the legacy per-piece path (same
    rng), and reuse the compiled fn across calls."""
    from flocoder_tpu import evaluation as ev
    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x

    def legacy_apply(x, t, c):
        return 0.25 - x

    params = {"a": jnp.asarray(0.25)}
    key = jax.random.PRNGKey(3)
    lat1, dec1, nfe1 = sampler(legacy_apply, codec, {}, key, batch_size=6,
                               n_steps=4, latent_shape=(4, 4, 3),
                               cfg_strength=0.0, n_classes=0)
    before = len(ev._fused_cache)
    lat2, dec2, nfe2 = sampler(apply_p, codec, {}, key, batch_size=6,
                               n_steps=4, latent_shape=(4, 4, 3),
                               cfg_strength=0.0, n_classes=0, params=params)
    after = len(ev._fused_cache)
    assert after == before + 1
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(lat2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2),
                               rtol=1e-5, atol=1e-6)
    assert nfe1 == nfe2 == 12
    # second call with the same config hits the cache (no new entry)
    sampler(apply_p, codec, {}, jax.random.PRNGKey(4), batch_size=6,
            n_steps=4, latent_shape=(4, 4, 3), cfg_strength=0.0,
            n_classes=0, params=params)
    assert len(ev._fused_cache) == after


def test_evaluate_model_fused_params(tmp_path):
    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x
    target = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 3)) * 0.1 + 0.5
    metrics = evaluate_model(apply_p, codec, {}, epoch=1,
                             target_latents=target,
                             rng=jax.random.PRNGKey(2), batch_size=8,
                             n_steps=4, method="rk4", cfg_strength=0.0,
                             use_wandb=False, output_dir=str(tmp_path),
                             params={"a": jnp.asarray(0.5)})
    for key in ("FID_px", "sinkhorn", "mse"):
        assert key in metrics and np.isfinite(metrics[key])


def test_sampler_fused_ab4_matches_eager():
    """method='ab4' routes through the fused generate+decode executable and
    matches the eager generate_latents path bit-for-bit (same key)."""
    import flocoder_tpu.evaluation as ev
    from flocoder_tpu.sampling import generate_latents

    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x
    params = {"a": jnp.asarray(0.5)}
    lat, dec, nfe = ev.sampler(apply_p, codec, {}, jax.random.PRNGKey(7),
                               batch_size=4, n_steps=8,
                               latent_shape=(4, 4, 3), cfg_strength=0.0,
                               n_classes=0, method="ab4", params=params)
    assert int(nfe) == 12 + (7 - 3)
    # eager reference: same split discipline as sampler (k_init, k_gen, k_cls)
    _, k_gen, _ = jax.random.split(jax.random.PRNGKey(7), 3)
    lat_ref, _ = generate_latents(lambda x, t, c: params["a"] - x,
                                  (4, 4, 4, 3), k_gen, method="ab4",
                                  n_steps=8, cfg_strength=0.0)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_ref),
                               atol=1e-6)
    assert np.isfinite(np.asarray(dec)).all()


def test_make_e2e_sampler_sharded_mesh():
    """Sharded serving: the e2e sampler under a >1-device mesh splits the
    batch over the data axes (outputs placed on all devices), draws
    independent noise per shard, and a non-divisible batch falls back to
    one device."""
    from flocoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.size == 8, "conftest pins an 8-device CPU platform"
    codec = SimpleResizeAE(latent_shape=(4, 4, 3), image_size=8)
    f = make_e2e_sampler(lambda p, x, t, c: 0.5 - x, codec, (4, 4, 3),
                         batch_size=16, n_steps=4, cfg_strength=0.0,
                         n_classes=0, mesh=mesh)
    lat, img = f({}, {}, jax.random.PRNGKey(0), jnp.zeros(16, jnp.int32))
    assert lat.shape == (16, 4, 4, 3) and img.shape == (16, 8, 8, 3)
    assert len(lat.sharding.device_set) == 8
    # per-shard independent noise: integrated latents differ across shards
    per_shard = np.asarray(lat).reshape(8, 2, -1)
    assert np.std(per_shard.mean(axis=(1, 2))) > 0
    # fixed-point pull toward 0.5 on every shard
    assert abs(float(lat.mean()) - 0.5) < 0.5

    # batch 6 doesn't divide 8 shards → single-device fallback, still runs
    f6 = make_e2e_sampler(lambda p, x, t, c: 0.5 - x, codec, (4, 4, 3),
                          batch_size=6, n_steps=4, cfg_strength=0.0,
                          n_classes=0, mesh=mesh)
    lat6, img6 = f6({}, {}, jax.random.PRNGKey(0), jnp.zeros(6, jnp.int32))
    assert lat6.shape == (6, 4, 4, 3)


def test_make_e2e_sampler_sharded_with_int8_decode():
    """Serving composition: the sharded fused sampler with the W8A8 int8
    decoder (ops/quant.py) — QuantConv must run under shard_map and stay
    close to the plain decode on the same params."""
    from flocoder_tpu.models.sd_vae import SDVAE
    from flocoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    sd = SDVAE(image_size=16, channels=(32, 64), weights_path="")
    sd_q = SDVAE(image_size=16, channels=(32, 64), weights_path="",
                 quant_decode=True)
    params = sd.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    imgs = {}
    for tag, codec in (("plain", sd), ("int8", sd_q)):
        f = make_e2e_sampler(lambda p, x, t, c: 0.5 - x, codec,
                             (2, 2, 4), batch_size=16, n_steps=4,
                             cfg_strength=0.0, n_classes=0, mesh=mesh)
        lat, img = f({}, params, jax.random.PRNGKey(0),
                     jnp.zeros(16, jnp.int32))
        # 2×2 latents through the 2-stage decoder (2× upsample) → 4×4 pixels
        assert img.shape == (16, 4, 4, 3)
        assert len(img.sharding.device_set) == 8
        imgs[tag] = np.asarray(img, np.float32)
    rel = (np.linalg.norm(imgs["int8"] - imgs["plain"])
           / max(np.linalg.norm(imgs["plain"]), 1e-9))
    assert rel < 0.10, rel


def test_sampler_fused_sharded_mesh():
    """sampler(params=..., mesh=...) serves class-conditional batches under
    shard_map with outputs spanning the mesh."""
    from flocoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x
    params = {"a": jnp.asarray(0.25)}
    cond = {"class_cond": jnp.arange(16, dtype=jnp.int32) % 4,
            "mask_cond": None}
    lat, dec, nfe = sampler(apply_p, codec, {}, jax.random.PRNGKey(5),
                            batch_size=16, n_steps=4, latent_shape=(4, 4, 3),
                            cfg_strength=0.0, n_classes=4, cond=cond,
                            params=params, mesh=mesh)
    assert lat.shape == (16, 4, 4, 3) and nfe == 12
    assert len(lat.sharding.device_set) == 8
    assert np.isfinite(np.asarray(dec)).all()


def test_sampler_fused_sharded_inpainting_operands():
    """The sharded fused sampler splits EVERY batch-shaped operand —
    source, init_latents (via init_image), mask_cond — over the mesh, not
    just class_cond."""
    from flocoder_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x
    params = {"a": jnp.asarray(0.25)}
    B = 16
    source = jax.random.normal(jax.random.PRNGKey(9), (B, 4, 4, 3))
    mask = jnp.ones((B, 4, 4, 1))
    init_image = jnp.zeros((1, 4, 4, 3)) + 0.3  # tiled to B inside sampler
    cond = {"class_cond": jnp.arange(B, dtype=jnp.int32) % 4,
            "mask_cond": mask}
    lat, dec, nfe = sampler(apply_p, codec, {}, jax.random.PRNGKey(5),
                            batch_size=B, n_steps=4, latent_shape=(4, 4, 3),
                            cfg_strength=0.0, n_classes=4, cond=cond,
                            source=source, init_image=init_image,
                            init_strength=0.5, params=params, mesh=mesh)
    assert lat.shape == (B, 4, 4, 3)
    assert len(lat.sharding.device_set) == 8
    assert np.isfinite(np.asarray(dec)).all()


def test_sampler_fused_sde_meanflow_nfe_and_t_scale():
    """The fused path handles the round-3 methods: 'sde' matches the eager
    sampler bit-for-bit (same key), 'meanflow' reports nfe = SEGMENTS
    (n_steps, not n_steps-1), and t_scale is part of the fused-cache key so
    a dual-time (t_scale=1) serving config can't collide with a t·999 one."""
    import flocoder_tpu.evaluation as ev
    from flocoder_tpu.sampling import generate_latents

    codec = NoOpAE()
    apply_p = lambda p, x, t, c: p["a"] - x
    params = {"a": jnp.asarray(0.5)}

    lat, dec, nfe = ev.sampler(apply_p, codec, {}, jax.random.PRNGKey(7),
                               batch_size=4, n_steps=8,
                               latent_shape=(4, 4, 3), cfg_strength=0.0,
                               n_classes=0, method="sde", params=params)
    assert int(nfe) == 7  # 8 grid points → 7 Euler–Maruyama intervals
    _, k_gen, _ = jax.random.split(jax.random.PRNGKey(7), 3)
    lat_ref, _ = generate_latents(lambda x, t, c: params["a"] - x,
                                  (4, 4, 4, 3), k_gen, method="sde",
                                  n_steps=8, cfg_strength=0.0)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat_ref),
                               atol=1e-6)
    assert np.isfinite(np.asarray(dec)).all()

    # meanflow: n_steps means SEGMENTS (1 NFE each); t_scale=1.0 keys a
    # separate cache entry from the default 999
    before = len(ev._fused_cache)
    lat1, _, nfe1 = ev.sampler(apply_p, codec, {}, jax.random.PRNGKey(7),
                               batch_size=4, n_steps=1,
                               latent_shape=(4, 4, 3), cfg_strength=0.0,
                               n_classes=0, method="meanflow", params=params,
                               t_scale=1.0)
    assert int(nfe1) == 1
    assert lat1.shape == (4, 4, 4, 3)
    mid = len(ev._fused_cache)
    assert mid == before + 1
    ev.sampler(apply_p, codec, {}, jax.random.PRNGKey(7), batch_size=4,
               n_steps=1, latent_shape=(4, 4, 3), cfg_strength=0.0,
               n_classes=0, method="meanflow", params=params)  # t_scale=999
    assert len(ev._fused_cache) == mid + 1
