#!/usr/bin/env python3
"""Pre-encode an image dataset into latents with frozen augmentations
(reference: preencode_data.py).

Usage:
    ./preencode_data.py --config-name flowers_sd.yaml [key=value ...]

TPU-first shape (SURVEY.md §3.2): the host thread pool runs the frozen
augmentations and feeds batches; ``codec.encode`` runs jitted (sharded over
the data mesh axis when multiple chips are present); latent shards are
written as ``.npy``/``.npz`` by a writer thread pool. Each pass through the
dataset re-randomizes transforms and saves the result — ``augs_per`` copies
per image (reference: preencode_data.py:85-100). Refuses to overwrite an
existing output dir (reference: :69-71) and enforces ``max_storage_gb``
(:112).
"""
from __future__ import annotations

import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def process_dataset(config, split: str, codec, codec_params, mesh):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.data.datasets import (ImageFolderDataset,
                                            InfiniteDataset,
                                            SyntheticImageDataset, Loader,
                                            dataset_by_name)
    from flocoder_tpu.data.transforms import image_transforms, midi_transforms
    from flocoder_tpu.inpainting import generate_mask_batch
    from flocoder_tpu.parallel.mesh import shard_batch

    data_path = os.path.expanduser(str(config.data))
    image_size = int(ldcfg(config, "image_size", 128))
    batch_size = int(config.preencoding.get("batch_size", 32))
    augs_per = int(config.preencoding.get("augs_per", 16))
    max_gb = float(config.preencoding.get("max_storage_gb", 60))
    quantize = bool(config.preencoding.get("quantize", False))
    inpainting = bool(config.get("inpainting", False))
    num_workers = int(config.preencoding.get("num_workers", 4))
    seed = int(ldcfg(config, "seed", 0)) + (0 if split == "train" else 1)

    is_midi = any(s in data_path.lower() for s in ("pop909", "midi"))
    is_audio = getattr(codec, "is_audio", False)
    if is_audio and inpainting:
        raise SystemExit("inpainting triplets are an image-pipeline feature; "
                         "codec.choice=dac pre-encodes waveforms")
    # device_augs: the host decodes each image ONCE (single resize); the
    # chip manufactures all augs_per frozen augmentations as one batched
    # affine-gather executable (flocoder_tpu/data/device_augs.py) — removes
    # the PIL host bottleneck SURVEY §3.2/§7 flags on the pre-encode pass.
    device_augs = (bool(config.preencoding.get("device_augs", False))
                   and not is_midi and not is_audio)
    augment = None
    if is_audio:
        # audio path (codec.choice=dac): random crops ARE the frozen
        # augmentation; latent sequences fold to square latent images so
        # train_flow consumes them unchanged (models/audio_codec.py)
        from flocoder_tpu.data.audio_io import (AudioFolderDataset,
                                                SyntheticAudioDataset)
        crop_len = int(config.codec.get("crop_len", 32768))
        sample_rate = int(config.codec.get("sample_rate", 16000))
        if os.path.isdir(data_path):
            root = (os.path.join(data_path, split)
                    if os.path.isdir(os.path.join(data_path, split))
                    else data_path)
            dataset = AudioFolderDataset(root, crop_len=crop_len,
                                         sample_rate=sample_rate)
        else:
            print(f"WARNING: {data_path} not found; using synthetic audio")
            dataset = SyntheticAudioDataset(
                crop_len=crop_len, sample_rate=sample_rate,
                n_classes=int(ldcfg(config, "n_classes", 4)))
    elif device_augs:
        from flocoder_tpu.data.device_augs import (default_src_size,
                                                   load_resized,
                                                   make_device_augment)
        from flocoder_tpu.data.native_image import NativeLoadResized
        from flocoder_tpu.data.native_image import available as \
            native_image_available
        src_size = default_src_size(image_size)
        if native_image_available():
            # C++ decode+resize (native/fcimage.cpp) — removes the per-image
            # PIL cost from the host half of the pipeline
            tf = NativeLoadResized(src_size)
        else:
            tf = lambda img, rng: load_resized(img, src_size)
        augment = make_device_augment(image_size)
        aug_key = jax.random.PRNGKey(seed + 7919)
    else:
        tf = (midi_transforms(image_size) if is_midi
              else image_transforms(image_size))
    if not is_audio:
        named = dataset_by_name(data_path, split, tf)
        if named is not None:
            dataset = named  # torchvision dispatch (reference: :45-53)
        elif os.path.isdir(data_path):
            dataset = ImageFolderDataset(data_path, transform=tf)
        else:
            print(f"WARNING: {data_path} not found; using synthetic dataset")
            dataset = SyntheticImageDataset(image_size=image_size,
                                            transform=tf)

    out_dir = f"{data_path}_encoded_{config.codec.choice}"
    if inpainting:
        out_dir += "_inpainting"
    out_split = os.path.join(out_dir, split)
    if os.path.exists(out_split) and os.listdir(out_split):
        raise SystemExit(f"Refusing to overwrite existing {out_split} "
                         "(reference behavior: preencode_data.py:69-71)")
    os.makedirs(out_split, exist_ok=True)

    # split: 90/10 by index (deterministic)
    n = len(dataset)
    idx = np.arange(n)
    np.random.default_rng(0).shuffle(idx)
    n_val = max(1, n // 10)
    ids = idx[:n_val] if split == "val" else idx[n_val:]

    class _Subset:
        n_classes = getattr(dataset, "n_classes", 0)
        def __len__(self):
            return len(ids)
        def get(self, i, rng):
            return dataset.get(int(ids[i]), rng)

    batch_size = max(1, min(batch_size, len(ids)))  # small splits still batch
    # InfiniteDataset view: every pass redraws items with replacement so each
    # of the augs_per passes re-randomizes the frozen augmentations
    # (reference: preencode_data.py:59, data.py:287-307)
    loader = Loader(InfiniteDataset(_Subset(), length=len(ids)), batch_size,
                    shuffle=True, num_workers=num_workers, seed=seed,
                    key="pixels")

    if is_audio:
        from flocoder_tpu.models.audio_codec import fold_latents
        encode = jax.jit(lambda x: fold_latents(
            codec.encode(codec_params, x)))
    else:
        encode = jax.jit(lambda x: codec.encode(codec_params, x))
    quant = (jax.jit(lambda z: codec.quantize(codec_params, z)[0])
             if quantize and hasattr(codec, "quantize") else None)
    if (quantize and hasattr(codec, "encode_quantize_fused")
            and bool(config.preencoding.get("fused_vq", False))):
        # encode+quantize with the compression tail + RVQ search fused in
        # one Pallas kernel. Default OFF: hardware timing shows throughput
        # parity with the XLA path (the encoder body dominates — BENCH_r02,
        # docs/ROADMAP.md), so the kernel's value is fp32-exact quantization
        # (zero bf16-conv drift in the picks); opt in with
        # preencoding.fused_vq=true when that exactness matters.
        fused = jax.jit(lambda x: codec.encode_quantize_fused(codec_params,
                                                              x)[0])
        encode, quant = fused, None

    total_batches = max(1, (augs_per * len(ids)) // batch_size)
    bytes_written = 0
    lock = threading.Lock()
    writer = ThreadPoolExecutor(8)
    class_names = getattr(dataset, "class_names", None)

    # packed-shard output (preencoding.format=shard): one mmap-able file per
    # split served by the native C++ gather (flocoder_tpu/data/shard.py)
    fmt = str(config.preencoding.get("format", "files"))
    shard = None
    if fmt == "shard":
        from flocoder_tpu.data.shard import ShardWriter
        probe = (jnp.zeros((1, int(config.codec.get("crop_len", 32768)), 1))
                 if is_audio else
                 jnp.zeros((1, image_size, image_size,
                            getattr(codec, "in_channels", 3))))
        lat_shape = tuple(np.asarray(encode(probe)).shape[1:])
        extras = ({"source_latents": lat_shape,
                   "mask_pixels": (image_size, image_size, 1)}
                  if inpainting else None)
        shard = ShardWriter(os.path.join(out_split, "data.fcshard"),
                            lat_shape, extra_fields=extras)

    def write_one(split_dir, name, latent, label, extra=None):
        nonlocal bytes_written
        sub = (class_names[label] if class_names and class_names != [""]
               else f"{label:04d}" if _Subset.n_classes else "data")
        d = os.path.join(split_dir, sub)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, name)
        if extra:
            np.savez(path, **extra)
            path += ".npz"
        else:
            np.save(path, latent)
            path += ".npy"
        with lock:
            bytes_written += os.path.getsize(path)

    t0 = time.time()
    n_saved = 0
    batch_iter = iter(loader)
    for b in range(total_batches):
        try:
            batch = next(batch_iter)
        except StopIteration:
            batch_iter = iter(loader)
            batch = next(batch_iter)
        # device placement sharded over the mesh's data axes: on a pod slice
        # each chip encodes its own sub-batch (the embarrassingly-parallel
        # stage, SURVEY §3.2); degenerate single-device put on one chip
        pixels = shard_batch(mesh, np.asarray(batch["pixels"]))
        labels = np.asarray(batch["class_cond"])
        if augment is not None:
            pixels = augment(pixels, jax.random.fold_in(aug_key, b))
        if inpainting:
            masks = generate_mask_batch(pixels.shape[1:3],
                                        batch_size=pixels.shape[0],
                                        seed=seed * 100003 + b)
            # device-side blend inherits pixels' sharding
            masked = pixels * (1 - jnp.asarray(masks))
            target = encode(pixels)
            source = encode(masked)
            if quant is not None:
                target, source = quant(target), quant(source)
            target, source = np.asarray(target), np.asarray(source)
            if shard is not None:
                with lock:
                    bytes_written += shard.add_batch(
                        target, labels, {"source_latents": source,
                                         "mask_pixels": masks})
                n_saved += target.shape[0]
            else:
                for i in range(target.shape[0]):
                    writer.submit(write_one, out_split, f"b{b:06d}_{i:03d}",
                                  None, int(labels[i]),
                                  {"target_latents": target[i],
                                   "source_latents": source[i],
                                   "mask_pixels": masks[i].astype(bool)})
                    n_saved += 1
        else:
            z = encode(pixels)
            if quant is not None:
                z = quant(z)
            z = np.asarray(z)
            if shard is not None:
                with lock:
                    bytes_written += shard.add_batch(z, labels)
                n_saved += z.shape[0]
            else:
                for i in range(z.shape[0]):
                    writer.submit(write_one, out_split, f"b{b:06d}_{i:03d}",
                                  z[i], int(labels[i]))
                    n_saved += 1
        if bytes_written > max_gb * 1e9:
            print(f"storage cap {max_gb}GB reached")
            break
        if b % 50 == 0:
            rate = n_saved / max(time.time() - t0, 1e-9)
            print(f"  [{split}] batch {b}/{total_batches}  "
                  f"{n_saved} latents  {rate:.0f}/s  "
                  f"{bytes_written/1e9:.2f}GB")
    writer.shutdown(wait=True)
    if shard is not None:
        shard.close()
    rate = n_saved / max(time.time() - t0, 1e-9)
    print(f"[{split}] done: {n_saved} latents in {time.time()-t0:.0f}s "
          f"({rate:.0f} latents/s) → {out_split}")


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import parse_cli, ldcfg
    from flocoder_tpu.models.codecs import setup_codec
    from flocoder_tpu.parallel.mesh import make_mesh
    from flocoder_tpu.training.checkpoint import (load_checkpoint,
                                                  load_into_tree,
                                                  flatten_tree)

    config = parse_cli(default_config=None,
                       config_dir=os.path.join(os.path.dirname(
                           os.path.abspath(__file__)), "configs"))
    print("Config:", dict(config))
    # +quant=int8 requests the W8A8 pre-encode path (ops/quant.py): the
    # encode is inference-only, its conv body matches the shapes where int8
    # measured 1.27-1.29× over bf16 on v5e, and the latent head stays in
    # the plain dtype (below MIN_QUANT_CHANNELS). Opt-in: quantized encode
    # perturbs the saved latents by ~int8 step error.
    quant_cli = config.get("quant", None)
    if quant_cli is not None and str(quant_cli).lower() in ("int8", "true",
                                                            "1"):
        if "codec" not in config:
            config["codec"] = {}
        config.codec["quant_encode"] = "int8"
    mesh = make_mesh()
    codec = setup_codec(config)
    image_size = int(ldcfg(config, "image_size", 128))
    rng = jax.random.PRNGKey(0)
    if getattr(codec, "is_audio", False):
        crop_len = int(config.codec.get("crop_len", 32768))
        codec_params = codec.init(rng, jnp.zeros((1, crop_len, 1)))
    else:
        codec_params = codec.init(rng, jnp.zeros((1, image_size, image_size,
                                                  codec.in_channels)))
    ckpt = config.codec.get("checkpoint") if "codec" in config else None
    if getattr(codec, "is_audio", False) and not (
            ckpt and os.path.exists(str(ckpt))):
        # audio default: the newest train_audio_codec.py checkpoint
        from flocoder_tpu.training.checkpoint import latest_checkpoint
        ckpt = latest_checkpoint("checkpoints", "dac_")
    if ckpt and os.path.exists(str(ckpt)):
        ck = load_checkpoint(str(ckpt))
        codec_params = load_into_tree(codec_params,
                                      flatten_tree(ck["model_state_dict"]),
                                      strict=False)
        print(f"loaded codec checkpoint {ckpt}")
    for split in ("val", "train"):
        process_dataset(config, split, codec, codec_params, mesh)


if __name__ == "__main__":
    main()
