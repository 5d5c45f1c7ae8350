"""Losses and evaluation metrics (reference: flocoder/metrics.py).

Differentiable: focal loss (metrics.py:57-66), piano-roll RGB cross-entropy
with per-channel onset/sustain thresholds (:69-99), VGG-style multi-layer
perceptual loss (:103-115), FFT spectral loss (:145-159), the
``compute_vqgan_losses`` aggregator (:163-189) and its λ-weighted total
(:192-204), hinge GAN loss (:210-211), and the adversarial-loss pair with
feature matching (:214-249).

Non-differentiable eval: ``to_uint8`` per-image renorm (:258-263), FID via
ops.fid (torchmetrics replacement, :265-308), piano-roll gray⇄RGB conversions
(:312-327), discriminator health stats (:460-475), per-image per-channel
range matching (:479-488), and ``compute_sample_metrics`` (:493-555).

Everything is pure JAX (jit-friendly); the Sinkhorn divergence comes from
ops.sinkhorn (geomloss replacement). Images are NHWC.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ops.fid import fid_score, fid_score_chunked
from .ops.sinkhorn import sinkhorn_loss, sinkhorn_loss_chunked

__all__ = [
    "focal_loss", "piano_roll_rgb_cross_entropy", "perceptual_loss",
    "spectral_loss", "hinge_d_loss", "feature_matching_loss",
    "discriminator_loss", "generator_loss", "compute_vqgan_losses",
    "get_total_vqgan_loss", "to_uint8", "rgb2g", "g2rgb", "normalize_recon",
    "compute_sample_metrics", "get_discriminator_stats",
    "sinkhorn_loss", "sinkhorn_loss_chunked", "fid_score", "fid_score_chunked",
]


# --------------------------------------------------------------------------
# Differentiable losses
# --------------------------------------------------------------------------

def focal_loss(pred_logits, target_binary, alpha: float = 0.9,
               gamma: float = 2.0):
    """Binary focal loss on logits (reference: metrics.py:57-66)."""
    bce = sigmoid_bce(pred_logits, target_binary)
    p_t = jnp.exp(-bce)
    alpha_t = alpha * target_binary + (1 - alpha) * (1 - target_binary)
    return jnp.mean(alpha_t * (1 - p_t) ** gamma * bce)


def sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid BCE (logits), elementwise."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def piano_roll_rgb_cross_entropy(pred, target, temperature: float = 0.25,
                                 onset_threshold: float = 0.3,
                                 sustain_threshold: float = 0.5):
    """Pixel-precision CE for piano-roll images (reference: metrics.py:69-99).
    NHWC; RGB channels are (onset=red, sustain=green, unused=blue) with
    per-channel binarization thresholds; grayscale uses the sustain
    threshold."""
    if target.shape[-1] == 1:
        thresholds = jnp.asarray([sustain_threshold])
    else:
        thresholds = jnp.asarray([onset_threshold, sustain_threshold, 1.0])
    target_binary = (target > thresholds[None, None, None, :]).astype(
        pred.dtype)
    return focal_loss(pred / temperature, target_binary)


def perceptual_loss(feature_fn: Callable, img1, img2):
    """Multi-layer feature MSE (reference: metrics.py:103-115). ``feature_fn``
    maps ImageNet-normalized NHWC images to a list of feature maps (see
    models/perceptual.py for the VGG16-style extractor)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])[None, None, None, :]
    std = jnp.asarray([0.229, 0.224, 0.225])[None, None, None, :]
    if img1.shape[-1] != 3:
        img1 = jnp.repeat(img1, 3, axis=-1)[..., :3]
        img2 = jnp.repeat(img2, 3, axis=-1)[..., :3]
    f1 = feature_fn((img1 - mean) / std)
    f2 = feature_fn((img2 - mean) / std)
    loss = 0.0
    for a, b in zip(f1, f2):
        loss = loss + jnp.mean((a - b) ** 2)
    return loss


def spectral_loss(x, x_recon):
    """MSE between 2-D FFT magnitudes (reference: metrics.py:145-159)."""
    def pwr(y):
        return jnp.abs(jnp.fft.fft2(y.astype(jnp.float32), axes=(1, 2)))
    return jnp.mean((pwr(x) - pwr(x_recon)) ** 2)


def hinge_d_loss(real_pred, fake_pred):
    """Hinge discriminator loss (reference: metrics.py:210-211)."""
    return (jnp.mean(jax.nn.relu(1.0 - real_pred)) +
            jnp.mean(jax.nn.relu(1.0 + fake_pred)))


def feature_matching_loss(real_features, fake_features):
    """L1 between discriminator feature maps (reference: metrics.py:232-236);
    real features are treated as constants."""
    loss = 0.0
    for rf, ff in zip(real_features, fake_features):
        loss = loss + jnp.mean(jnp.abs(ff - jax.lax.stop_gradient(rf)))
    return loss / max(len(real_features), 1)


def discriminator_loss(disc_apply: Callable, disc_params, real_images,
                       fake_images):
    """(reference: metrics.py:238-241). Returns (d_loss, real_features)."""
    real_pred, real_features = disc_apply(disc_params, real_images)
    fake_pred, _ = disc_apply(disc_params, jax.lax.stop_gradient(fake_images))
    return hinge_d_loss(real_pred, fake_pred), real_features


def lecam_loss(d_real, d_fake, reg_weight: float = 0.001):
    """LeCAM regularization (reference: vqgan_plus.py:260-262)."""
    return reg_weight * (jnp.mean(jax.nn.relu(1.0 + d_real)) +
                         jnp.mean(jax.nn.relu(1.0 - d_fake)))


def discriminator_loss_lecam(disc_apply: Callable, disc_params, real_images,
                             fake_images, reg_weight: float = 0.001):
    """Hinge D loss + LeCAM regularization (reference:
    VQGANPlusAdversarialLoss.discriminator_loss, vqgan_plus.py:288-299).
    Returns (d_loss, real_features)."""
    real_pred, real_features = disc_apply(disc_params, real_images)
    fake_pred, _ = disc_apply(disc_params, jax.lax.stop_gradient(fake_images))
    return (hinge_d_loss(real_pred, fake_pred) +
            lecam_loss(real_pred, fake_pred, reg_weight), real_features)


def generator_loss(disc_apply: Callable, disc_params, fake_images,
                   real_features=None):
    """Non-saturating hinge G loss + optional feature matching
    (reference: metrics.py:243-249)."""
    fake_pred, fake_features = disc_apply(disc_params, fake_images)
    g_loss = -jnp.mean(fake_pred)
    if real_features is not None:
        g_loss = g_loss + feature_matching_loss(real_features, fake_features)
    return g_loss


def compute_vqgan_losses(recon, target_imgs, vq_loss, config,
                         perceptual_fn: Optional[Callable] = None,
                         disc_apply: Optional[Callable] = None,
                         disc_params=None, warmed_up: bool = False,
                         report_d_loss: bool = True,
                         real_features=None) -> dict:
    """Aggregate codec losses (reference: metrics.py:163-189). ``warmed_up``
    replaces the reference's ``epoch >= warmup_epochs`` host check so the
    whole thing stays jittable (two compiled variants, pre/post warmup).

    ``report_d_loss=False`` drops the monitoring-only hinge D loss — the
    fused GAN step (training/vqgan.py) reports the D-step's own d_loss and
    overwrites this one, so its stop-gradient fake forward is pure waste
    there; the real forward still runs for the feature-matching targets.

    ``real_features``: precomputed feature-matching targets — skips the
    discriminator real forward entirely (the fused GAN step's
    ``codec.share_real_features`` option reuses the D step's)."""
    cc = config.codec
    losses = {"mse": jnp.mean((recon - target_imgs) ** 2), "vq": vq_loss}
    if float(cc.get("lambda_perc", 0)) > 0 and perceptual_fn is not None:
        losses["perceptual"] = perceptual_loss(perceptual_fn, recon,
                                               target_imgs)
    if float(cc.get("lambda_ce", 0)) > 0:
        losses["ce"] = piano_roll_rgb_cross_entropy(recon, target_imgs)
    if disc_apply is not None and warmed_up:
        if real_features is not None:
            pass  # targets supplied by the caller; no real forward
        elif report_d_loss:
            d_loss, real_features = discriminator_loss(
                disc_apply, disc_params, target_imgs, recon)
            losses["d_loss"] = d_loss
        else:
            _, real_features = disc_apply(disc_params, target_imgs)
        g_loss = generator_loss(disc_apply, disc_params, recon, real_features)
        losses["g_loss"] = float(cc.get("lambda_gen", 0.05)) * g_loss
    return losses


def get_total_vqgan_loss(losses: dict, config):
    """λ-weighted total (reference: metrics.py:192-204)."""
    cc = config.codec
    total = (float(cc.get("lambda_mse", 0.5)) * losses["mse"] +
             float(cc.get("lambda_vq", 0.25)) * losses["vq"] +
             float(cc.get("lambda_ce", 0.0)) * losses.get("ce", 0.0) +
             float(cc.get("lambda_perc", 0.0)) * losses.get("perceptual", 0.0) +
             losses.get("g_loss", 0.0))
    return total


# --------------------------------------------------------------------------
# Non-differentiable eval metrics
# --------------------------------------------------------------------------

def to_uint8(x):
    """Per-image min-max → uint8 (reference: metrics.py:258-263). NHWC."""
    x = jax.lax.stop_gradient(x)
    mn = x.min(axis=(1, 2, 3), keepdims=True)
    x = x - mn
    mx = jnp.maximum(x.max(axis=(1, 2, 3), keepdims=True), 1e-5)
    return jnp.clip(x / mx * 255.0, 0, 255).astype(jnp.uint8)


def rgb2g(img):
    """RGB piano roll → grayscale float: black→0, red→1, green→0.5
    (reference: metrics.py:312-317). NHWC."""
    red = (img[..., 0] > 0.5).astype(jnp.float32)
    green = (img[..., 1] > 0.5).astype(jnp.float32) * 0.5
    return (red + green)[..., None]


def g2rgb(gf_img, keep_gray: bool = False):
    """Grayscale float → quantized RGB piano roll (reference:
    metrics.py:319-327). NHWC."""
    if gf_img.shape[-1] == 3:
        return gf_img
    gf = gf_img[..., 0]
    if keep_gray:
        return jnp.repeat(((gf > 0.5).astype(jnp.float32))[..., None], 3,
                          axis=-1)
    return jnp.stack([(gf >= 0.75).astype(jnp.float32),
                      (jnp.abs(gf - 0.5) < 0.25).astype(jnp.float32),
                      jnp.zeros_like(gf)], axis=-1)


def normalize_recon(orig, recon):
    """Match each recon image/channel's range to the original's
    (reference: metrics.py:479-488), vectorized over batch and channels."""
    o_min = orig.min(axis=(1, 2), keepdims=True)
    o_max = orig.max(axis=(1, 2), keepdims=True)
    r_min = recon.min(axis=(1, 2), keepdims=True)
    r_max = recon.max(axis=(1, 2), keepdims=True)
    denom = jnp.maximum(r_max - r_min, 1e-8)
    rescaled = (recon - r_min) / denom * (o_max - o_min) + o_min
    return jnp.where(r_max > r_min, rescaled, recon)


def get_discriminator_stats(disc_apply, disc_params, real_images,
                            fake_images) -> dict:
    """(reference: metrics.py:460-468)."""
    d_real = jnp.mean(disc_apply(disc_params, real_images)[0])
    d_fake = jnp.mean(disc_apply(disc_params, fake_images)[0])
    return {"d_real_mean": d_real, "d_fake_mean": d_fake,
            "d_conf_gap": d_real - d_fake}


def compute_sample_metrics(pred_latents, target_latents, decoded_pred,
                           decoded_target, feature_fn=None) -> dict:
    """Sample-quality metric bundle (reference: metrics.py:493-555):
    FID (pixel space), Sinkhorn divergence (latent + pixel), MSEs, and
    distribution moments. Returns a dict of scalar jax arrays."""
    bs = min(pred_latents.shape[0], target_latents.shape[0])
    pl, tl = pred_latents[:bs], target_latents[:bs]
    decoded_pred = normalize_recon(decoded_target, decoded_pred)
    if feature_fn is None:
        from .ops.fid import default_feature_fn
        feature_fn = default_feature_fn(image_size=decoded_target.shape[1])
    return {
        # FID consumes per-image min-max uint8 renders, matching the
        # reference's to_uint8 → FrechetInceptionDistance pipeline
        # (metrics.py:258-263, 291-308). Feeding raw decoded floats let a
        # single >2.0 pixel trip the feature extractor's uint8-range
        # heuristic and crush the whole batch to a constant (degenerate
        # covariance → FID_px=nan in on-chip evals).
        "FID_px": fid_score(to_uint8(decoded_target),
                            to_uint8(decoded_pred),
                            feature_fn=feature_fn),
        "sinkhorn": sinkhorn_loss(tl, pl),
        "sinkhorn_px": sinkhorn_loss(decoded_target, decoded_pred),
        "mse": jnp.mean((pl - tl) ** 2),
        "mse_px": jnp.mean((decoded_pred - decoded_target) ** 2),
        "pred_mean": pl.mean(), "targ_mean": tl.mean(),
        "pred_std": pl.std(), "targ_std": tl.std(),
        "pred_px_mean": decoded_pred.mean(),
        "targ_px_mean": decoded_target.mean(),
        "pred_px_std": decoded_pred.std(),
        "targ_px_std": decoded_target.std(),
    }
