"""Training-loop PRNG key construction with a selectable generator.

JAX's default ``threefry2x32`` PRNG computes random bits with vector ALU
ops — on TPU that competes with the model for VPU cycles. The VQGAN codec's
training forward is the heavy case: NoiseInjection draws a normal for every
decoder activation (~19M values/image → ~1.2B at B=64, 128²) plus encoder
dropout masks, measured at ~69 ms of a 215 ms bf16 forward
(benchmarks/rng_probe.py). The ``rbg`` implementation routes those draws
through the hardware ``RngBitGenerator`` instead: same forward drops to
~182 ms (−15%), with the deterministic floor at 146 ms.

``rbg`` keys are typed JAX keys (``jax.random.key``) so ``split``/``fold_in``
propagate the implementation through the existing training loops unchanged.
Trade-off, per the JAX docs: rbg's split/fold_in are weaker statistically and
its bit streams are only stable for a fixed compiler version/backend — fine
for training noise, not for anything requiring cross-version reproducibility.
Default stays threefry; opt in via the ``rng_impl: rbg`` config key
(read by train_vqgan.py / train_flow.py).
"""
from __future__ import annotations

import jax

__all__ = ["make_training_key"]


def make_training_key(seed: int, impl: str | None = None):
    """PRNGKey for the training loop. ``impl``: None/'threefry' → JAX
    default (uint32 key, reproducible across versions); 'rbg' → hardware
    RngBitGenerator (faster bulk draws on TPU, see module docstring)."""
    if impl in (None, "", "default", "threefry", "threefry2x32"):
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)
