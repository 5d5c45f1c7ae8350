"""Golden-value parity tests against torch semantics (SURVEY.md §4b, §7
"numerical parity audits"). torch (CPU) is available in this environment, so
core numerical building blocks are checked directly against their torch
equivalents — layout-converted, not copied."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_groupnorm_matches_torch():
    from flax import linen as nn
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)  # NHWC
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))

    tgn = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        tgn.weight.fill_(1.0)
        tgn.bias.fill_(0.0)
        theirs = tgn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    from flocoder_tpu.models.unet import pixel_shuffle
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 12)).astype(np.float32)  # NHWC, C=12=3*4
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_shuffle(
        torch.tensor(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_pixel_unshuffle_matches_torch():
    from flocoder_tpu.models.unet import pixel_unshuffle
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_unshuffle(
        torch.tensor(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_cosine_warm_restart_decay_matches_torch_schedule():
    """Our closed-form schedule vs torch CosineAnnealingWarmRestarts stepped
    per epoch, with the reference's decay-on-restart behavior
    (general.py:142-171) applied manually to the torch baseline."""
    from flocoder_tpu.training.schedules import cosine_warm_restarts_decay
    base_lr, T0, Tm, decay = 0.01, 5, 2, 0.6
    ours = cosine_warm_restarts_decay(base_lr, T_0=T0, T_mult=Tm, decay=decay,
                                      steps_per_epoch=1)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=T0, T_mult=Tm)
    for epoch in range(30):
        torch_lr = opt.param_groups[0]["lr"]
        our_lr = float(ours(epoch))
        assert abs(our_lr - torch_lr) < 1e-6 + 1e-3 * base_lr, \
            f"epoch {epoch}: ours {our_lr} vs torch {torch_lr}"
        # the reference decays base_lrs when the step is about to wrap
        # (general.py:153-157: `if self.T_cur + 1 == self.T_i`)
        if sched.T_cur + 1 == sched.T_i:
            sched.base_lrs = [b * decay for b in sched.base_lrs]
        sched.step()


def test_bilinear_resize_close_to_torch():
    """jax.image.resize (bilinear) vs F.interpolate(align_corners=False) —
    the SimpleResizeAE path. These differ at most mildly on borders."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(jax.image.resize(jnp.asarray(x), (1, 8, 8, 3),
                                       "bilinear", antialias=False))
    theirs = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), size=(8, 8), mode="bilinear",
        align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_conv_same_padding_matches_torch():
    from flax import linen as nn
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)  # HWIO
    conv = nn.Conv(5, (3, 3), padding=1, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w)}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    tw = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
    theirs = torch.nn.functional.conv2d(
        torch.tensor(x).permute(0, 3, 1, 2), tw, padding=1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_reference_pt_latents_loadable(tmp_path):
    """The reference saves latents as torch .pt files (preencode_data.py:155);
    our PreEncodedDataset must read them, converting CHW→HWC."""
    from flocoder_tpu.data.datasets import PreEncodedDataset
    d = tmp_path / "train" / "0000"
    d.mkdir(parents=True)
    lat = torch.randn(4, 8, 8)  # reference layout CHW
    torch.save(lat, str(d / "x.pt"))
    ds = PreEncodedDataset(str(tmp_path / "train"))
    item, label = ds.get(0, np.random.default_rng(0))
    assert item.shape == (8, 8, 4)  # HWC
    np.testing.assert_allclose(item, lat.permute(1, 2, 0).numpy(), atol=1e-6)
