"""dreamer4_tpu — a TPU-native (JAX / XLA / Pallas / pjit) Dreamer 4 framework.

Built from scratch with the capabilities of lucidrains/dreamer4 (the reference
implementation), re-designed TPU-first: functional core, explicit PRNG keys,
static-shape caches, pjit/GSPMD sharding, Pallas kernels on the hot paths.
"""

__version__ = '0.1.0'
