#!/usr/bin/env python3
"""Generate samples from a trained flow checkpoint
(reference: generate_samples.py).

Usage:
    ./generate_samples.py --config-name flowers_sd.yaml \
        +flow_checkpoint=checkpoints/flowema_100.npz +n_samples=64

Loads the flow (and codec) checkpoints, infers the U-Net shape from the
checkpoint's embedded config (the reference infers it from the init_conv
weight shape, generate_samples.py:91-98 — here the config rides inside the
checkpoint, training/checkpoint.py), integrates with RK4/Euler/RK45, decodes,
and writes PNG grids + individual files. The MIDI path converts square
piano-roll images to rectangular layout and then to .mid files
(reference: :311-318). The gradio app (reference: :243-343) is gated on the
package being installed (it is not in this environment).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_MODEL_CACHE: dict = {}


def load_models_once(config, flow_ckpt_path: str):
    """Build + load flow model and codec, cached per (checkpoint path,
    requested serving dtype) (reference: generate_samples.py:60-118)."""
    # The bundle depends on the bf16 request, so it's part of the cache key
    # — a fp32 call after a bf16 one (webapp requests) must not reuse the
    # wrong-dtype models. None = defer to the checkpoint's own flag.
    bf16_cli = config.get("bf16", None)
    # +quant=int8 requests the W8A8 serving decode (ops/quant.py) — like
    # bf16, an explicit CLI value overrides the checkpoint's own
    # codec.quant_decode flag in both directions.
    quant_cli = config.get("quant", None)
    quant_req = (None if quant_cli is None
                 else str(quant_cli).lower() in ("int8", "true", "1"))
    cache_key = (flow_ckpt_path,
                 None if bf16_cli is None else bool(bf16_cli), quant_req)
    if cache_key in _MODEL_CACHE:
        return _MODEL_CACHE[cache_key]
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.models.codecs import setup_codec
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.training.checkpoint import (load_checkpoint,
                                                  load_into_tree,
                                                  flatten_tree)

    ck = load_checkpoint(flow_ckpt_path)
    ck_config = ck["config"] or config
    n_classes = int(ldcfg(ck_config, "n_classes", 0))
    dim_mults = tuple(ldcfg(ck_config, "dim_mults", [1, 2, 4, 8]))

    # +bf16=true/false serves in bfloat16/float32 compute (params stay fp32
    # from the checkpoint) — the TPU-native analog of the reference's
    # optional fp16 cast (generate_samples.py:114-117). An explicit CLI
    # value overrides the checkpoint's flag in BOTH directions.
    bf16 = (bool(bf16_cli) if bf16_cli is not None
            else bool(ldcfg(ck_config, "bf16", False)))
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    codec = setup_codec(ck_config, dtype=dtype)
    quant = (quant_req if quant_req is not None
             else str(ldcfg(ck_config, "quant_decode", "")) == "int8")
    if hasattr(codec, "decoder") and hasattr(codec.decoder, "quant") \
            and codec.decoder.quant != quant:
        codec.decoder = codec.decoder.clone(quant=quant)
    image_size = int(ldcfg(ck_config, "image_size", 128))
    is_audio = getattr(codec, "is_audio", False)
    if is_audio:
        # audio (DAC) checkpoints size latents off the waveform crop length
        # (models/audio_codec.py latent_shape/fold contract)
        crop_len = int(ldcfg(ck_config, "crop_len", 32768))
        H, W, C = codec.latent_shape(crop_len)
    elif hasattr(codec, "latent_shape"):
        H, W, C = codec.latent_shape(image_size)
    else:
        H, W, C = (16, 16, 4)

    # dual-time (MeanFlow) checkpoints carry flow.meanflow=true in their
    # embedded config (train_flow.py model_kwargs) and keep time UNSCALED
    # (t_scale=1 — see train_flow.py on the jvp identity target)
    meanflow = bool(ldcfg(ck_config, "meanflow", False))
    # flow.arch=hdit checkpoints rebuild the Hourglass DiT family from the
    # same embedded config (train_flow.py arch dispatch)
    if str(ldcfg(ck_config, "arch", "unet")).lower() == "hdit":
        from flocoder_tpu.models.hdit import hdit_from_config
        model = hdit_from_config(ck_config, channels=C,
                                 n_classes=n_classes, dtype=dtype,
                                 dual_time=meanflow)
    else:
        model = Unet(dim=H, channels=C, dim_mults=dim_mults,
                     n_classes=n_classes, dtype=dtype, dual_time=meanflow)
    rng = jax.random.PRNGKey(0)
    cond0 = {"class_cond": jnp.zeros((1,), jnp.int32), "mask_cond": None}
    template = {"model": model.init(rng, jnp.zeros((1, H, W, C)),
                                    jnp.zeros((1,)), cond0)}
    params = load_into_tree(template, flatten_tree(ck["model_state_dict"]),
                            strict=False)

    codec_params = codec.init(jax.random.PRNGKey(1), jnp.zeros(
        (1, crop_len, 1) if is_audio else
        (1, image_size, image_size, codec.in_channels)))
    codec_ckpt = ck_config.codec.get("checkpoint") if "codec" in ck_config else None
    if is_audio and not (codec_ckpt and os.path.exists(str(codec_ckpt))):
        from flocoder_tpu.training.checkpoint import latest_checkpoint
        codec_ckpt = latest_checkpoint("checkpoints", "dac_")
    if codec_ckpt and os.path.exists(str(codec_ckpt)):
        cck = load_checkpoint(str(codec_ckpt))
        codec_params = load_into_tree(codec_params,
                                      flatten_tree(cck["model_state_dict"]),
                                      strict=False)

    bundle = dict(model=model, params=params, codec=codec,
                  codec_params=codec_params, latent_shape=(H, W, C),
                  n_classes=n_classes, config=ck_config,
                  t_scale=1.0 if meanflow else 999.0)
    _MODEL_CACHE[cache_key] = bundle
    # alias: a later call whose explicit flags match the checkpoint's own
    # resolution must not rebuild an identical bundle (and vice versa)
    _MODEL_CACHE[(flow_ckpt_path, bf16, quant)] = bundle
    if ((bf16_cli is None or bool(bf16_cli) == bool(
            ldcfg(ck_config, "bf16", False)))
            and (quant_req is None or quant_req == (
                str(ldcfg(ck_config, "quant_decode", "")) == "int8"))):
        _MODEL_CACHE[(flow_ckpt_path, None, None)] = bundle
    return bundle


def save_sample_batch(decoded, batch_idx: int, output_dir: str,
                      is_midi: bool = False, max_individual: int = 100):
    """Grids + up to 100 individual PNGs (reference:
    generate_samples.py:161-185); MIDI samples also convert to .mid."""
    from flocoder_tpu.utils.viz import save_img_grid, save_img
    os.makedirs(output_dir, exist_ok=True)
    save_img_grid(decoded, epoch=batch_idx, tag=f"samples_b{batch_idx}",
                  use_wandb=False, output_dir=output_dir)
    n = min(decoded.shape[0], max_individual)
    for i in range(n):
        path = os.path.join(output_dir, f"sample_{batch_idx:03d}_{i:03d}.png")
        save_img(np.asarray(decoded[i]), path)
        if is_midi:
            try:
                from flocoder_tpu.data.pianoroll import (img_file_2_midi_file,
                                                         square_to_rect_file)
                rect = square_to_rect_file(path)
                img_file_2_midi_file(rect, path.replace(".png", ".mid"))
            except Exception as e:
                print(f"MIDI conversion failed for {path}: {e}")


def generate_samples(config):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.evaluation import sampler

    flow_ckpt = str(config.get("flow_checkpoint", "") or
                    ldcfg(config, "flow_checkpoint", ""))
    if not flow_ckpt:
        from flocoder_tpu.training.checkpoint import latest_checkpoint
        flow_ckpt = (latest_checkpoint("checkpoints", "flowema_") or
                     latest_checkpoint("checkpoints", "flow_") or "")
    if not flow_ckpt or not os.path.exists(flow_ckpt):
        raise SystemExit(f"flow checkpoint not found: {flow_ckpt!r} "
                         "(pass +flow_checkpoint=...)")
    print(f"loading {flow_ckpt}")
    b = load_models_once(config, flow_ckpt)

    n_samples = int(config.get("n_samples", 64))
    batch_size = min(int(ldcfg(config, "batch_size", 256)), n_samples)
    n_steps = int(config.get("n_steps", ldcfg(config, "n_steps", 100)))
    method = str(config.get("method", "rk4"))
    cfg_strength = float(config.get("cfg_strength",
                                    ldcfg(config, "cfg_strength", 3.0)))
    output_dir = str(config.get("output_dir", "samples"))
    is_midi = any(s in str(config.get("data", "")).lower()
                  for s in ("midi", "pop909"))
    keep_gray = int(ldcfg(config, "in_channels", 3)) == 1

    model, params = b["model"], b["params"]
    # stable params-as-argument apply → sampler's fused generate+decode
    # executable compiles once and is reused across batches
    apply_p = lambda p, x, t, c: model.apply(p, x, t, c)
    key = jax.random.PRNGKey(int(config.get("seed", 0)))

    # multi-chip host: serve under shard_map over the data mesh axes (the
    # sampler treats degenerate meshes as single-device and falls back for
    # partial batches that don't split)
    from flocoder_tpu.parallel.mesh import batch_shard_count, make_mesh
    serve_mesh = make_mesh()
    if batch_shard_count(serve_mesh) > 1:
        print(f"serving over {batch_shard_count(serve_mesh)} batch shards "
              f"({dict(serve_mesh.shape)})")

    # +class_cond=N samples a single class; default is the 10-column class
    # grid (when the model is class-conditional)
    fixed_class = config.get("class_cond", None)
    # +init_image=path.png +init_strength=0.5 — img2img-style start from an
    # encoded init image (the sampler accepts file paths; reference exposes
    # this only via the sampler API, sampling.py:191-208). Empty string
    # (cleared UI field) means none; strength defaults to 0.5 when an image
    # is given (0.0 would silently ignore it). Encoded ONCE here — the
    # generation loop reuses the latents across batches.
    init_image = config.get("init_image", None) or None
    init_strength = float(config.get("init_strength",
                                     0.5 if init_image else 0.0))
    init_latents = None
    if init_image is not None:
        from PIL import Image
        img = Image.open(str(init_image)).convert("RGB")
        arr = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
        init_latents = jax.jit(b["codec"].encode)(b["codec_params"], arr)

    done, batch_idx = 0, 0
    while done < n_samples:
        bs = min(batch_size, n_samples - done)
        key, k = jax.random.split(key)
        t0 = time.time()
        cond = None
        if fixed_class is not None and b["n_classes"] > 0:
            import jax.numpy as jnp
            cond = {"class_cond": jnp.full((bs,), int(fixed_class),
                                           jnp.int32), "mask_cond": None}
        latents, decoded, nfe = sampler(
            apply_p, b["codec"], b["codec_params"], k, method=method,
            batch_size=bs, n_steps=n_steps, cond=cond,
            n_classes=b["n_classes"], latent_shape=b["latent_shape"],
            cfg_strength=cfg_strength, is_midi=is_midi, keep_gray=keep_gray,
            init_latents=init_latents, init_strength=init_strength,
            params=params["model"], t_scale=b["t_scale"], mesh=serve_mesh)
        decoded = np.asarray(decoded)
        dt = time.time() - t0
        print(f"batch {batch_idx}: {bs} samples, nfe={int(nfe)}, "
              f"{dt:.2f}s ({bs/dt:.1f} samples/s)")
        if getattr(b["codec"], "is_audio", False):
            # DAC codec decodes to waveforms — write WAVs, not PNGs
            from flocoder_tpu.data.audio_io import save_wav
            os.makedirs(output_dir, exist_ok=True)
            sr = getattr(b["codec"], "sample_rate", 16000)
            for i in range(decoded.shape[0]):
                save_wav(os.path.join(
                    output_dir, f"sample_{batch_idx:03d}_{i:03d}.wav"),
                    decoded[i], sr)
        else:
            save_sample_batch(decoded, batch_idx, output_dir, is_midi=is_midi)
        done += bs
        batch_idx += 1
    print(f"wrote {done} samples to {output_dir}/")


def midi_to_audio(midi_path: str) -> str:
    """MIDI → WAV via the timidity binary when present
    (reference: generate_samples.py:20-27)."""
    import shutil
    import subprocess
    wav = midi_path.replace(".mid", ".wav")
    if shutil.which("timidity") is None:
        raise RuntimeError("timidity not installed")
    subprocess.run(["timidity", midi_path, "-Ow", "-o", wav], check=True,
                   capture_output=True)
    return wav


def create_gradio_interface(config):
    """Gradio UI (reference: generate_samples.py:243-343): checkpoint /
    sample-count / CFG / method / steps widgets + gallery; MIDI outputs get
    .mid downloads and (when timidity exists) audio previews. When the
    gradio package is missing (this environment), falls back to the
    first-party stdlib web UI (flocoder_tpu.ui.webapp — same controls and
    outputs, zero dependencies)."""
    try:
        import gradio as gr
    except ImportError:
        from flocoder_tpu.ui.webapp import launch_webapp
        print("gradio not installed — serving the first-party stdlib UI")
        return launch_webapp(config)
    import glob

    from flocoder_tpu.config import ldcfg

    def run(ckpt, n_samples, cfg_strength, method, n_steps, seed,
            init_image, init_strength):
        cfg = config
        cfg["flow_checkpoint"] = ckpt
        cfg["n_samples"] = int(n_samples)
        cfg["cfg_strength"] = float(cfg_strength)
        cfg["method"] = method
        cfg["n_steps"] = int(n_steps)
        cfg["seed"] = int(seed)
        # always assign (not only when set): cfg is the shared config
        # object, so a cleared image widget must also clear a previous
        # request's init_image
        cfg["init_image"] = str(init_image) if init_image else None
        cfg["init_strength"] = float(init_strength)
        cfg["output_dir"] = "samples_gradio"
        generate_samples(cfg)
        pngs = sorted(glob.glob("samples_gradio/sample_*.png"))
        mids = sorted(glob.glob("samples_gradio/*.mid"))
        return pngs, (mids[:10] if mids else None)

    ckpts = sorted(glob.glob("checkpoints/flow*_*.npz"))
    with gr.Blocks(title="flocoder-tpu") as app:
        gr.Markdown("# flocoder-tpu sample generator")
        with gr.Row():
            ckpt = gr.Dropdown(choices=ckpts,
                               value=ckpts[-1] if ckpts else None,
                               label="checkpoint")
            n_samples = gr.Slider(1, 256, value=16, step=1, label="samples")
            cfg_s = gr.Slider(0, 10, value=3.0, step=0.5, label="CFG strength")
        with gr.Row():
            method = gr.Radio(["rk4", "heun", "midpoint", "ab4", "euler", "rk45", "sde", "meanflow"], value="rk4",
                              label="integrator")
            steps = gr.Slider(4, 200, value=int(ldcfg(config, "n_steps", 100)),
                              step=1, label="steps")
            seed = gr.Number(value=0, label="seed")
        with gr.Row():
            init_image = gr.Image(type="filepath", label="init image "
                                  "(optional, img2img)")
            init_strength = gr.Slider(0, 1, value=0.5, step=0.05,
                                      label="init strength")
        btn = gr.Button("Generate")
        gallery = gr.Gallery(label="samples")
        midi_files = gr.Files(label="MIDI files")
        btn.click(run, [ckpt, n_samples, cfg_s, method, steps, seed,
                        init_image, init_strength],
                  [gallery, midi_files])
    app.launch(share=True)


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from flocoder_tpu.config import parse_cli
    config = parse_cli(default_config=None,
                       config_dir=os.path.join(os.path.dirname(
                           os.path.abspath(__file__)), "configs"))
    if config.get("use_gradio"):
        create_gradio_interface(config)
    else:
        generate_samples(config)


if __name__ == "__main__":
    main()
