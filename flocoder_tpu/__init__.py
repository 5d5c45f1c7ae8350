"""flocoder_tpu — TPU-native latent generative flow matching.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``drscotthawley/flocoder`` (latent flow matching: VQGAN/SD-VAE codecs,
flow-matching U-Net, ODE sampling with CFG, inpainting, MIDI piano-roll
pipeline), designed TPU-first: NHWC layouts, jitted ``lax.scan`` ODE
integration, functional RVQ with psum-reducible EMA statistics, Pallas
neighborhood attention, and a ``jax.sharding`` device-mesh parallel layer the
reference never had.
"""
from . import config
from .config import Config, load_config, ldcfg, parse_cli

__version__ = "0.1.0"

# Curated public API (lazy imports keep `import flocoder_tpu` light).
_LAZY = {
    "Unet": "flocoder_tpu.models.unet",
    "HDiT": "flocoder_tpu.models.hdit",
    "setup_codec": "flocoder_tpu.models.codecs",
    "VQVAE": "flocoder_tpu.models.codecs",
    "NoOpAE": "flocoder_tpu.models.codecs",
    "SimpleResizeAE": "flocoder_tpu.models.codecs",
    "VQGANPlus": "flocoder_tpu.models.vqgan_plus",
    "SDVAE": "flocoder_tpu.models.sd_vae",
    "MaskEncoder": "flocoder_tpu.inpainting",
    "generate_latents": "flocoder_tpu.sampling",
    "warp_time": "flocoder_tpu.sampling",
    "sampler": "flocoder_tpu.evaluation",
    "evaluate_model": "flocoder_tpu.evaluation",
    "compute_ot_pairing": "flocoder_tpu.ops.ot",
    "sinkhorn_loss": "flocoder_tpu.ops.sinkhorn",
    "na2d": "flocoder_tpu.ops.neighborhood_attention",
    "make_mesh": "flocoder_tpu.parallel.mesh",
    "shard_batch": "flocoder_tpu.parallel.mesh",
    "make_flow_train_step": "flocoder_tpu.training.flow",
    "save_checkpoint": "flocoder_tpu.training.checkpoint",
    "load_checkpoint": "flocoder_tpu.training.checkpoint",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'flocoder_tpu' has no attribute {name!r}")
