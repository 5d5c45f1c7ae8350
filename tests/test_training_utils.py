"""Checkpoint, schedule, EMA, inpainting, metrics unit tests."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.training.checkpoint import (flatten_tree, unflatten_tree,
                                              save_checkpoint, load_checkpoint,
                                              load_into_tree,
                                              keep_recent_files,
                                              latest_checkpoint)
from flocoder_tpu.training.schedules import cosine_warm_restarts_decay
from flocoder_tpu.training.ema import ema_init, ema_update
from flocoder_tpu.config import Config


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones((2, 3)), "c": np.zeros(4)}, "d": np.arange(5)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])


def test_checkpoint_rotation(tmp_path):
    params = {"w": np.ones((3,))}
    for e in range(1, 8):
        save_checkpoint(params, epoch=e, ckpt_dir=str(tmp_path),
                        prefix="t_", keep=3)
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 3
    assert latest_checkpoint(str(tmp_path), "t_").endswith("t_7.npz")


def test_checkpoint_config_embedded(tmp_path):
    cfg = Config({"flow": {"lr": 0.1}, "name": "x"})
    p = save_checkpoint({"w": np.ones(2)}, epoch=1, ckpt_dir=str(tmp_path),
                        config=cfg)
    ck = load_checkpoint(p)
    assert ck["config"].flow.lr == 0.1
    assert ck["epoch"] == 1


def test_load_into_tree_strict_and_partial():
    template = {"a": np.zeros((2,)), "b": {"c": np.zeros((3,))}}
    state = {"a": np.ones((2,)), "b/c": np.full((3,), 2.0)}
    restored = load_into_tree(template, state, strict=True)
    np.testing.assert_array_equal(restored["a"], 1.0)
    partial = load_into_tree(template, {"a": np.ones((2,))}, strict=False)
    np.testing.assert_array_equal(partial["b"]["c"], 0.0)
    with pytest.raises(KeyError):
        load_into_tree(template, {"a": np.ones((2,))}, strict=True)


def test_cosine_warm_restart_decay_schedule():
    s = cosine_warm_restarts_decay(1.0, T_0=10, T_mult=2, decay=0.5,
                                   steps_per_epoch=1)
    assert abs(float(s(0)) - 1.0) < 1e-6          # start of cycle 0
    assert float(s(9)) < 0.05                     # near end of cycle 0
    assert abs(float(s(10)) - 0.5) < 1e-6         # restart with decayed peak
    assert abs(float(s(30)) - 0.25) < 1e-6        # second restart (10+20)
    # monotone decrease within a cycle
    vals = [float(s(i)) for i in range(10, 30)]
    assert all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))


def test_batch_size_schedule_step_policy():
    from flocoder_tpu.training.schedules import batch_size_schedule
    # StepBS semantics: ×gamma every step_every epochs (1-based epochs)
    bs = batch_size_schedule(64, gamma=2.0, step_every=5)
    assert [bs(e) for e in (1, 5, 6, 10, 11)] == [64, 64, 128, 128, 256]
    # cap + quantization to the mesh shard count
    bs = batch_size_schedule(48, gamma=2.0, step_every=1, max_bs=100,
                             multiple_of=8)
    assert bs(1) == 48 and bs(2) == 96 and bs(3) == 96  # 100 → floor to 96
    # gamma < 1 shrinks but never below multiple_of
    bs = batch_size_schedule(16, gamma=0.5, step_every=1, multiple_of=8)
    assert bs(2) == 8 and bs(5) == 8


def test_batch_size_schedule_milestones():
    from flocoder_tpu.training.schedules import batch_size_schedule
    # MultiStepBS semantics: ×gamma at each milestone epoch
    bs = batch_size_schedule(32, gamma=2.0, milestones=[3, 7])
    assert [bs(e) for e in (1, 2, 3, 6, 7, 20)] == [32, 32, 64, 64, 128, 128]
    # constant when neither policy knob is set
    bs = batch_size_schedule(32)
    assert bs(1) == bs(99) == 32
    with pytest.raises(ValueError):
        batch_size_schedule(32, step_every=2, milestones=[3])
    with pytest.raises(ValueError):
        batch_size_schedule(32, gamma=0.0, step_every=2)


def test_ema_update_converges():
    p = {"w": jnp.zeros(3)}
    ema = ema_init(p)
    target = {"w": jnp.ones(3)}
    for _ in range(100):
        ema = ema_update(ema, target, decay=0.9)
    assert float(jnp.abs(ema["w"] - 1.0).max()) < 1e-4


def test_mask_generators():
    from flocoder_tpu.inpainting import generate_mask, generate_mask_batch
    rng = np.random.default_rng(0)
    for mt in ("total", "brush", "rectangles", "noise", "nothing"):
        m = generate_mask((64, 64), mask_type=mt, rng=rng)
        assert m.shape == (64, 64)
        assert set(np.unique(m)).issubset({0.0, 1.0})
    assert generate_mask((32, 32), "total", rng=rng).min() == 1.0
    assert generate_mask((32, 32), "nothing", rng=rng).max() == 0.0
    b = generate_mask_batch((32, 32), batch_size=3, seed=1)
    assert b.shape == (3, 32, 32, 1)


def test_mask_encoder_shapes():
    from flocoder_tpu.inpainting import MaskEncoder, mask_blending
    me = MaskEncoder(output_channels=4)
    m = jnp.ones((2, 64, 64, 1))
    params = me.init(jax.random.PRNGKey(0), m)
    out = me.apply(params, m)
    assert out.shape == (2, 4, 4, 4)   # 64 / 16
    # channel 0 = doubly shrunk raw mask: all-ones in → ones out
    np.testing.assert_allclose(np.asarray(out[..., 0]), 1.0, atol=1e-6)
    src = jnp.zeros((2, 4, 4, 4))
    noise = jnp.ones_like(src)
    blended = mask_blending(src, out, noise)
    assert blended.shape == src.shape


def test_metrics_basics():
    from flocoder_tpu.metrics import (focal_loss, to_uint8, g2rgb, rgb2g,
                                      normalize_recon, spectral_loss,
                                      hinge_d_loss)
    logits = jnp.array([[10.0, -10.0]])
    labels = jnp.array([[1.0, 0.0]])
    assert float(focal_loss(logits, labels)) < 1e-3
    x = jnp.stack([jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3))]) * 2 - 1
    u = to_uint8(x)
    assert u.dtype == jnp.uint8
    g = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0)
    rgb = g2rgb(g)
    assert rgb.shape == (1, 4, 4, 3)
    assert float(rgb[0, 1, 1, 0]) == 1.0  # 1.0 → red
    back = rgb2g(rgb)
    assert float(back[0, 1, 1, 0]) == 1.0
    assert float(hinge_d_loss(jnp.ones(3) * 2, -jnp.ones(3) * 2)) == 0.0
    orig = jnp.ones((2, 4, 4, 3)) * 3
    recon = jnp.ones((2, 4, 4, 3))
    nr = normalize_recon(orig, recon)
    assert nr.shape == recon.shape


def test_fid_properties():
    from flocoder_tpu.ops.fid import fid_score, sqrtm_newton_schulz
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(64, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64, 8, 8, 3)).astype(np.float32))
    shifted = a + 2.0
    d_same = float(fid_score(a, b))
    d_diff = float(fid_score(a, shifted))
    assert d_diff > d_same
    # sqrtm: A = M Mᵀ PSD, sqrt(A)² ≈ A
    M = rng.normal(size=(16, 16)).astype(np.float32)
    A = jnp.asarray(M @ M.T)
    S = sqrtm_newton_schulz(A)
    np.testing.assert_allclose(np.asarray(S @ S), np.asarray(A), atol=1e-2,
                               rtol=1e-2)


def test_fid_finite_in_rank_deficient_regime():
    """256 samples × 2048-dim features (the standard eval shape) must not
    NaN the Newton-Schulz sqrtm (regression: FID_px=nan in the TPU demo)."""
    from flocoder_tpu.ops.fid import fid_score
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((256, 8, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((256, 8, 8, 4)).astype(np.float32))
    d_near = float(fid_score(a, b))
    d_far = float(fid_score(a, b + 3.0))
    assert np.isfinite(d_near) and np.isfinite(d_far)
    assert d_far > d_near >= 0


def test_sharded_checkpoint_roundtrip_and_mesh_reshape(tmp_path):
    """save_checkpoint_sharded writes per-host shard files; the loader
    reassembles full arrays that restore onto a DIFFERENT mesh shape
    (VERDICT r2 #9: multi-host checkpoints, mesh-shape independent)."""
    import jax
    import numpy as np
    from flocoder_tpu.parallel.mesh import make_mesh, shard_state
    from flocoder_tpu.training.checkpoint import (load_checkpoint_sharded,
                                                  save_checkpoint_sharded)
    if jax.device_count() < 4:
        import pytest
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(0)
    state = {"params": {"w": rng.standard_normal((8, 16)).astype(np.float32),
                        "b": rng.standard_normal((16,)).astype(np.float32)},
             "step": np.int32(7)}
    mesh8 = make_mesh(n_data=8)
    sharded = shard_state(mesh8, jax.tree.map(jax.numpy.asarray, state),
                          min_size=16)
    path = save_checkpoint_sharded(sharded, epoch=3, ckpt_dir=str(tmp_path),
                                   prefix="flow_")
    assert "host0" in path
    out = load_checkpoint_sharded(str(tmp_path), "flow_", 3)
    assert out["epoch"] == 3
    np.testing.assert_array_equal(out["state"]["params"]["w"],
                                  state["params"]["w"])
    np.testing.assert_array_equal(out["state"]["params"]["b"],
                                  state["params"]["b"])
    assert int(out["state"]["step"]) == 7

    # restore onto a different mesh shape
    mesh4 = make_mesh(n_data=4)
    restored = shard_state(mesh4, jax.tree.map(jax.numpy.asarray,
                                               out["state"]), min_size=16)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  state["params"]["w"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax interop backend (docs/ROADMAP.md): same nested-tree contract
    through orbax's CheckpointManager, config riding along as JSON."""
    import numpy as np
    import pytest
    from flocoder_tpu.config import Config
    from flocoder_tpu.training.checkpoint import (load_checkpoint_orbax,
                                                  orbax_available,
                                                  save_checkpoint_orbax)
    if not orbax_available():
        pytest.skip("orbax not installed")

    rng = np.random.default_rng(1)
    state = {"params": {"w": rng.standard_normal((4, 8)).astype(np.float32),
                        "b": rng.standard_normal((8,)).astype(np.float32)},
             "step": np.int32(11)}
    cfg = Config({"flow": {"lr": 1e-3}, "seed": 3})
    save_checkpoint_orbax(state, epoch=2, ckpt_dir=str(tmp_path / "ob"),
                          config=cfg, keep=3)

    out = load_checkpoint_orbax(str(tmp_path / "ob"))  # latest
    assert out["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(out["state"]["params"]["w"]),
                                  state["params"]["w"])
    assert int(out["state"]["step"]) == 11
    assert out["config"] is not None
    assert float(out["config"].flow.lr) == pytest.approx(1e-3)


def test_make_training_key_rbg_drives_training_steps():
    """rng_impl=rbg (hardware RngBitGenerator, utils/rng.py) produces a typed
    key whose split/fold_in propagate the impl — both production step kinds
    run under it and losses stay finite. Guards the train_vqgan/train_flow
    `rng_impl` config wiring (−15% codec fwd on TPU, benchmarks/rng_probe.py)."""
    from flocoder_tpu.utils.rng import make_training_key
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import VQVAE
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers,
                                             make_vqgan_warmup_step)

    assert make_training_key(0, None).dtype == jnp.uint32
    assert make_training_key(0, "threefry").dtype == jnp.uint32
    key = make_training_key(0, "rbg")
    k1, k2 = jax.random.split(key)
    assert jnp.issubdtype(k1.dtype, jax.dtypes.prng_key)

    B, S = 2, 8
    cfg = config_from_dict({"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 8,
        "num_downsamples": 2, "internal_dim": 8, "vq_embedding_dim": 4,
        "codebook_levels": 2, "vq_num_embeddings": 8,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_mse": 0.5, "lambda_vq": 0.25}})
    codec = VQVAE(in_channels=3, hidden_channels=8, num_downsamples=2,
                  internal_dim=8, vq_embedding_dim=4, codebook_levels=2,
                  vq_num_embeddings=8)
    params = codec.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)))
    tx_g, _ = make_vqgan_optimizers(1e-4)
    state = create_vqgan_state(params, tx_g)
    step = make_vqgan_warmup_step(codec, tx_g, cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)
    _, aux, _ = step(state, x, k1)
    assert np.isfinite(float(aux["total"]))


def test_approx_al_recovers_linear_operator():
    """approx_AL least-squares fit recovers the true measurement matrix
    when Y = X A^T exactly (reference: inpainting.py:68-88)."""
    import jax.numpy as jnp
    from flocoder_tpu.inpainting import approx_AL
    rng = np.random.default_rng(0)
    d = 12
    A_true = rng.standard_normal((d, d)).astype(np.float32)
    X = rng.standard_normal((64, d)).astype(np.float32)   # 64 samples
    Y = X @ A_true.T
    A_est = approx_AL(jnp.asarray(Y).reshape(64, 3, 2, 2),
                      jnp.asarray(X).reshape(64, 3, 2, 2))
    np.testing.assert_allclose(np.asarray(A_est), A_true, atol=2e-3)


def test_algorithm3_pulls_velocity_toward_measurement():
    """The PiGDM-style correction (reference: inpainting.py:92-130) leaves a
    consistent velocity untouched (zero residual) and otherwise moves the
    implied x1_hat prediction toward satisfying y = A x1."""
    import jax.numpy as jnp
    from flocoder_tpu.inpainting import algorithm3
    d = 8
    A = jnp.eye(d, dtype=jnp.float32)      # identity measurement
    x1 = jnp.asarray(np.random.default_rng(1).standard_normal(d),
                     jnp.float32).reshape(2, 2, 2)
    tp = 0.5
    # conditional-OT path: x_t = t*x1 + (1-t)*x0; true v = x1 - x0
    x0 = jnp.zeros_like(x1)
    x_t = tp * x1 + (1 - tp) * x0
    v_true = x1 - x0
    y = A @ x1.reshape(-1)
    # consistent case: correction g has zero residual -> v unchanged
    v_corr = algorithm3(v_true, x_t, 0.5, tp, y, A, sigma_y=1e-4)
    np.testing.assert_allclose(np.asarray(v_corr), np.asarray(v_true),
                               atol=1e-3)
    # inconsistent case: measurement says x1 + delta; correction must move
    # the implied x1_hat prediction toward the measurement
    delta = jnp.ones(d, jnp.float32) * 0.5
    v_corr2 = algorithm3(v_true, x_t, 0.5, tp, y + A @ delta, A,
                         sigma_y=1e-4)
    # implied x1_hat from a velocity v at (x_t, tp) on the OT path:
    # x1_hat = coeff_inv * (v - d_ln_sigma_dt * x_t)
    def x1_hat(v):
        d_ln_ratio_dt = 1.0 / (tp * (1 - tp))
        d_ln_sigma_dt = -1.0 / (1 - tp)
        return (v - d_ln_sigma_dt * x_t) / (tp * d_ln_ratio_dt)
    err_before = float(jnp.linalg.norm(A @ x1_hat(v_true).reshape(-1)
                                       - (y + A @ delta)))
    err_after = float(jnp.linalg.norm(A @ x1_hat(v_corr2).reshape(-1)
                                      - (y + A @ delta)))
    assert err_after < err_before


def test_transfer_outer_layers_roundtrip():
    """Partial transfer learning (reference: codecs.py:746-774 — defined
    there but never called; here it's a tested API): outer encoder blocks +
    decoder tail convs come from the source, everything else keeps the
    fresh init, and the frozen mask marks exactly the transferred leaves."""
    import jax.numpy as jnp
    from flocoder_tpu.models.codecs import VQVAE
    from flocoder_tpu.training.checkpoint import (flatten_tree,
                                                  transfer_outer_layers)

    codec = VQVAE(in_channels=3, hidden_channels=8, num_downsamples=2,
                  vq_num_embeddings=8, internal_dim=8, codebook_levels=2,
                  vq_embedding_dim=4)
    fresh = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    donor = codec.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))
    source_state = {k: np.asarray(v) + 7.0
                    for k, v in flatten_tree(donor).items()}

    params, frozen = transfer_outer_layers(fresh, source_state)
    flat_new = flatten_tree(params)
    flat_fresh = flatten_tree(fresh)
    flat_frozen = flatten_tree(frozen)
    moved = [k for k, f in flat_frozen.items() if f]
    kept = [k for k, f in flat_frozen.items() if not f]
    assert moved, "nothing transferred"
    for k in moved:
        np.testing.assert_array_equal(np.asarray(flat_new[k]),
                                      source_state[k])
        assert (k.startswith("encoder/params/EncDecResidualBlock_0")
                or k.startswith("encoder/params/EncDecResidualBlock_1")
                or k.startswith("decoder/")), k
    for k in kept:
        np.testing.assert_array_equal(np.asarray(flat_new[k]),
                                      np.asarray(flat_fresh[k]))
