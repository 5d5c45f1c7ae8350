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
