"""Platform defaults for TPU execution."""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def configure_tpu_defaults() -> None:
    """Apply TPU-first runtime defaults.  Call before creating PRNG keys.

    * ``rbg`` PRNG: the TPU's hardware random-bit generator.  Dropout masks
      dominate RNG cost in training (≈75M random values per flagship step);
      threefry computes them on the VPU at ~10 ops/value, rbg is ~6% of the
      whole step faster (measured: 687 → 732 ex/s/chip).  Statistical quality
      is ample for dropout; tests keep threefry on CPU for determinism
      across backends.
    """
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        jax.config.update("jax_default_prng_impl", "rbg")
        logger.info("TPU defaults: rbg PRNG enabled")
