"""Parity tail (VERDICT r1 item 8): the full VQGANPlusDiscriminator, the
LeCAM-wired adversarial loss, TP/FP/FN note-metric images and the ResNet50
logits perceptual loss — components the reference has in inventory but does
not use in its live training path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flocoder_tpu.metrics import (discriminator_loss_lecam, hinge_d_loss,
                                  lecam_loss)
from flocoder_tpu.models.discriminator import (VQGANPlusDiscriminator,
                                               init_discriminator,
                                               make_disc_apply)


def test_vqgan_plus_discriminator_shapes():
    """Reference vqgan_plus.py:191-229: 3 stride-1 resblocks, blur-downsample
    ×2 (so logits at H/4), features after stem + each block."""
    disc = VQGANPlusDiscriminator(in_channels=3, base_channels=16, n_layers=3)
    x = jnp.zeros((2, 32, 32, 3))
    variables = init_discriminator(disc, jax.random.PRNGKey(0), x)
    logits, feats = make_disc_apply(disc)(variables, x)
    assert logits.shape == (2, 8, 8, 1)          # two stride-2 blurs
    assert len(feats) == 4                        # stem + 3 resblocks
    assert feats[0].shape == (2, 32, 32, 16)
    assert feats[-1].shape == (2, 8, 8, 128)      # 16·2³


def test_lecam_matches_reference_formula():
    """lecam = w·(mean(relu(1+d_real)) + mean(relu(1−d_fake)))
    (reference: vqgan_plus.py:260-262)."""
    d_real = jnp.asarray([0.5, -2.0, 3.0])
    d_fake = jnp.asarray([-0.5, 2.0, 0.0])
    want = 0.001 * (np.mean([1.5, 0.0, 4.0]) + np.mean([1.5, 0.0, 1.0]))
    np.testing.assert_allclose(float(lecam_loss(d_real, d_fake)), want,
                               rtol=1e-6)


def test_discriminator_loss_lecam_wiring():
    disc = VQGANPlusDiscriminator(in_channels=1, base_channels=8, n_layers=2)
    x = jnp.ones((2, 16, 16, 1))
    variables = init_discriminator(disc, jax.random.PRNGKey(0), x)
    apply_fn = make_disc_apply(disc)
    d_plain, feats = hinge_d_loss(*[apply_fn(variables, v)[0]
                                    for v in (x, x * 0.5)]), None
    d_lecam, real_feats = discriminator_loss_lecam(
        apply_fn, variables, x, x * 0.5, reg_weight=0.5)
    assert np.isfinite(float(d_lecam))
    assert len(real_feats) == 3
    # lecam strictly adds a non-negative term
    assert float(d_lecam) >= float(d_plain) - 1e-6


def test_note_metric_images():
    """TP/FP/FN mask images (reference: metrics.py:396-455)."""
    from flocoder_tpu.data.pianoroll import calc_note_metrics
    rng = np.random.default_rng(0)
    target = (rng.random((2, 16, 16, 3)) > 0.5).astype(np.float32)
    pred = target.copy()
    pred[0, :4] = 1.0 - pred[0, :4]  # flip a quarter of image 0
    metrics, images = calc_note_metrics(pred, target, return_images=True)
    for name in ("onset", "sustain"):
        for k in ("tp", "tn", "fp", "fn", "targpred"):
            img = images[f"{name}_{k}"]
            assert img.shape == (2, 16, 16, 3)
            assert img.min() >= 0.0 and img.max() <= 1.0
        # the four masks partition every pixel exactly once
        total = sum(images[f"{name}_{m}"][..., 0]
                    for m in ("tp", "tn", "fp", "fn"))
        np.testing.assert_array_equal(total, np.ones((2, 16, 16)))
    # targpred: red channel = target mask, green = pred mask
    np.testing.assert_array_equal(images["onset_targpred"][..., 0],
                                  (target[..., 0] > 0.4).astype(np.float32))


@pytest.mark.slow
def test_resnet50_port_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from oracles.torch_resnet50 import ResNet50
    from flocoder_tpu.models.perceptual import (ResNet50Logits,
                                                convert_torch_resnet50)
    torch.manual_seed(0)
    oracle = ResNet50().eval()
    with torch.no_grad():  # randomize BN stats so mapping bugs can't hide
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    variables = convert_torch_resnet50(oracle.state_dict())
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(
        np.float32) * 0.3
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ResNet50Logits().apply(variables, jnp.asarray(x)))
    assert got.shape == (1, 1000)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-8)
    assert err < 1e-3, err


def test_resnet50_perceptual_fn_random_init():
    from flocoder_tpu.models.perceptual import make_resnet50_perceptual_fn
    fn = make_resnet50_perceptual_fn(weights_path="/nonexistent.npz")
    a = jnp.zeros((1, 64, 64, 3)) + 0.5
    b = jnp.ones((1, 64, 64, 3)) * 0.25
    same = float(fn(a, a))
    diff = float(fn(a, b))
    assert same == 0.0 and diff > 0.0 and np.isfinite(diff)


@pytest.mark.slow
def test_vgg16_converter_matches_torch_oracle(tmp_path):
    """convert_torch_vgg16 maps a torchvision-layout features[:16] stack
    onto VGG16Features exactly (random-init torch oracle, same discipline
    as the ResNet50 parity test)."""
    torch = pytest.importorskip("torch")
    from torch import nn as tnn
    from flocoder_tpu.models.perceptual import (VGG16Features,
                                                convert_torch_vgg16,
                                                load_vgg16_weights)
    torch.manual_seed(0)
    layers, prev = [], 3
    for spec in (64, 64, "M", 128, 128, "M", 256, 256, 256):
        if spec == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(prev, spec, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            prev = spec
    oracle = tnn.Sequential(*layers).eval()
    sd = {f"features.{i}.{k}": v for i, m in enumerate(oracle)
          for k, v in m.state_dict().items()}
    flat = convert_torch_vgg16(sd)
    path = str(tmp_path / "vgg.npz")
    np.savez(path, **flat)
    variables = load_vgg16_weights(path)

    x = np.random.default_rng(2).standard_normal((1, 32, 32, 3)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    feats = VGG16Features().apply(variables, jnp.asarray(x))
    got = np.asarray(feats[-1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resnet50_perceptual_loss_has_input_gradients():
    """The loss must be usable as a training signal: gradients flow to the
    recon branch (reference metrics.py:117-142 semantics, VERDICT r2 weak
    #6 — the old double-stop-gradient made it silently inert)."""
    from flocoder_tpu.models.perceptual import make_resnet50_perceptual_fn
    fn = make_resnet50_perceptual_fn(weights_path="/nonexistent.npz")
    x = jnp.full((1, 64, 64, 3), 0.4)
    y = jnp.full((1, 64, 64, 3), 0.6)
    g = jax.grad(lambda a: fn(a, y))(x)
    assert float(jnp.abs(g).max()) > 0.0
