"""Audio family tests: WAV I/O, STFT/mel ops, the DAC-style codec, and the
training step (reference README.md:144 TODO "Add audio example, e.g. using
DAC" — the reference ships no audio path, so these suites define the
contract; the script-level pipeline loop lives in test_e2e_scripts.py)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flocoder_tpu.data.audio_io import (AudioFolderDataset,
                                        SyntheticAudioDataset, load_wav,
                                        save_wav)
from flocoder_tpu.models.audio_codec import (DACCodec, Snake, fold_latents,
                                             unfold_latents)
from flocoder_tpu.ops.audio import (mel_filterbank, multiscale_mel_loss,
                                    multiscale_stft_loss, stft)


def _tiny_codec(**kw):
    args = dict(sample_rate=8000, strides=(2, 4, 4), base_channels=8,
                vq_embedding_dim=4, codebook_levels=2, vq_num_embeddings=16)
    args.update(kw)
    return DACCodec(**args)


# --------------------------------------------------------------------------
# WAV I/O
# --------------------------------------------------------------------------

def test_wav_roundtrip_16bit(tmp_path):
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / 8000)
         ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 8000)
    y, sr = load_wav(p)
    assert sr == 8000 and y.shape == x.shape
    assert np.abs(x - y).max() < 2.0 / 32768  # 16-bit quantization bound


def test_wav_stereo_mixdown(tmp_path):
    import wave
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.5, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = (inter * 32767).astype("<i2")
    p = str(tmp_path / "st.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    y, _ = load_wav(p)
    assert y.shape == (100,)
    assert np.abs(y).max() < 1e-4  # L+R cancel


# --------------------------------------------------------------------------
# STFT / mel ops
# --------------------------------------------------------------------------

def test_stft_sine_peak_bin():
    sr, n_fft = 8000, 256
    k = 16  # bin index → freq k*sr/n_fft
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * (k * sr / n_fft) * t)[None].astype(np.float32)
    mag = np.asarray(stft(jnp.asarray(x), n_fft))
    assert mag.shape[-1] == n_fft // 2 + 1
    # every interior frame peaks at bin k
    peaks = mag[0, 2:-2].argmax(axis=-1)
    assert (peaks == k).all()


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 40)
    assert fb.shape == (257, 40)
    assert fb.min() >= 0
    # every filter has support; interior bins are covered by some filter
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[10:-10].sum(axis=1) > 0).all()


def test_spectral_losses_identity_and_separation():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((2, 2048)), jnp.float32) * 0.2
    y = jnp.asarray(g.standard_normal((2, 2048)), jnp.float32) * 0.2
    assert float(multiscale_stft_loss(x, x, fft_sizes=(64, 128))) < 1e-5
    assert float(multiscale_stft_loss(x, y, fft_sizes=(64, 128))) > 0.1
    mm = lambda a, b: multiscale_mel_loss(a, b, 8000, fft_sizes=(64, 128),
                                          n_mels=(8, 16))
    assert float(mm(x, x)) < 1e-5
    assert float(mm(x, y)) > 0.01


# --------------------------------------------------------------------------
# Codec
# --------------------------------------------------------------------------

def test_snake_init_identity_plus_sin2():
    m = Snake()
    x = jnp.linspace(-2, 2, 11)[None, :, None]
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    # α=1 at init: snake(x) = x + sin²(x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x + jnp.sin(x) ** 2), atol=1e-5)


def test_codec_shapes_and_fold():
    codec = _tiny_codec()
    assert codec.hop == 32
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2048, 1)).astype(np.float32)) * 0.1
    p = codec.init(jax.random.PRNGKey(0), x)
    z = codec.encode(p, x)
    assert z.shape == (2, 64, 4)
    f = fold_latents(z)
    assert f.shape == (2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(unfold_latents(f)),
                                  np.asarray(z))
    recon, commit, idx, _ = codec.forward(p, x, train=True,
                                          rng=jax.random.PRNGKey(1))
    assert recon.shape == x.shape and idx.shape == (2, 64, 2)
    assert np.abs(np.asarray(recon)).max() <= 1.0  # tanh head
    # decode accepts folded latent images (the flow-stack path)
    d4 = codec.decode(p, f)
    assert d4.shape == x.shape
    assert codec.latent_shape(2048) == (8, 8, 4)
    with pytest.raises(ValueError):
        codec.latent_shape(2048 + 32)  # 65 latent frames: not square
    with pytest.raises(ValueError):
        fold_latents(z[:, :63])


def test_setup_codec_dac_factory():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import setup_codec
    cfg = config_from_dict({"codec": {
        "choice": "dac", "sample_rate": 8000, "strides": [2, 4, 4],
        "base_channels": 8, "vq_embedding_dim": 4, "codebook_levels": 2,
        "vq_num_embeddings": 16}})
    codec = setup_codec(cfg)
    assert getattr(codec, "is_audio", False)
    assert codec.hop == 32 and codec.sample_rate == 8000


def test_audio_train_step_loss_decreases():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.training.audio import (make_audio_optimizer,
                                             make_audio_train_step)
    from flocoder_tpu.training.vqgan import create_vqgan_state
    codec = _tiny_codec()
    cfg = config_from_dict({"codec": {
        "sample_rate": 8000, "fft_sizes": [64, 128], "n_mels": [8, 16],
        "lambda_mel": 5.0}})
    g = np.random.default_rng(0)
    t = np.arange(1024) / 8000
    x = jnp.asarray(np.stack(
        [0.4 * np.sin(2 * np.pi * f * t) for f in (220, 440, 660, 880)]
    ).astype(np.float32))[..., None]
    p = codec.init(jax.random.PRNGKey(0), x)
    tx = make_audio_optimizer(3e-3)
    state = create_vqgan_state(p, tx)
    step = make_audio_train_step(codec, tx, cfg, donate=False)
    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(40):
        key, k = jax.random.split(key)
        state, aux, idx = step(state, x, k)
        if i == 0:
            first = float(aux["total"])
        last = float(aux["total"])
    assert np.isfinite(last) and last < first * 0.65, (first, last)
    assert idx.shape == (4, 32, 2)


# --------------------------------------------------------------------------
# Datasets
# --------------------------------------------------------------------------

def test_audio_folder_dataset(tmp_path):
    for cls, f0 in (("low", 200.0), ("high", 800.0)):
        d = tmp_path / cls
        d.mkdir()
        t = np.arange(3000) / 8000
        save_wav(str(d / "a.wav"),
                 0.5 * np.sin(2 * np.pi * f0 * t).astype(np.float32), 8000)
    ds = AudioFolderDataset(str(tmp_path), crop_len=2048, sample_rate=8000)
    assert ds.n_classes == 2 and len(ds) == 2
    rng = np.random.default_rng(0)
    x, lab = ds.get(0, rng)
    assert x.shape == (2048, 1) and x.dtype == np.float32
    assert sorted(ds.class_names) == ["high", "low"]
    # short-file zero-pad path
    save_wav(str(tmp_path / "low" / "short.wav"),
             np.full(100, 0.25, np.float32), 8000)
    ds2 = AudioFolderDataset(str(tmp_path), crop_len=2048, sample_rate=8000)
    i_short = [j for j, f in enumerate(ds2.files) if "short" in f][0]
    xs, _ = ds2.get(i_short, rng)
    assert xs.shape == (2048, 1)
    assert np.abs(xs[100:]).max() == 0.0 and np.abs(xs[:100]).min() > 0


def test_audio_folder_dataset_resamples(tmp_path):
    t = np.arange(4000) / 16000
    save_wav(str(tmp_path / "a.wav"),
             0.5 * np.sin(2 * np.pi * 400 * t).astype(np.float32), 16000)
    ds = AudioFolderDataset(str(tmp_path), crop_len=1500, sample_rate=8000)
    x, _ = ds.get(0, np.random.default_rng(0))
    # 4000 samples @16k → 2000 @8k; crop 1500 fits without padding
    assert x.shape == (1500, 1) and np.abs(x).max() > 0.3


def test_synthetic_audio_dataset_class_separation():
    ds = SyntheticAudioDataset(n=8, crop_len=2048, sample_rate=8000,
                               n_classes=4)
    rng = np.random.default_rng(0)
    x0, l0 = ds.get(0, rng)
    x4, l4 = ds.get(4, rng)
    assert l0 == l4 == 0
    x1, l1 = ds.get(1, rng)
    assert l1 == 1
    # classes differ by fundamental — spectra peak at different bins
    m0 = np.abs(np.fft.rfft(x0[:, 0])).argmax()
    m1 = np.abs(np.fft.rfft(x1[:, 0])).argmax()
    assert m1 > m0 * 1.5
