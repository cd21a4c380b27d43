"""grove_tpu — a TPU-native framework for grounded video caption generation.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the GROVE
reference stack (grounded video captioning: caption generation with per-phrase,
per-frame bounding boxes and temporal objectness), built TPU-first:

* static shapes everywhere (padded phrases/boxes with masks instead of ragged
  Python lists),
* `jax.jit`-compiled train/infer steps over `jax.sharding.Mesh` device meshes,
* Pallas kernels for the attention hot paths,
* Orbax checkpoints + a PyTorch-checkpoint converter for weight parity.

Layout:
  grove_tpu.config    — dataclass configs for every sub-network
  grove_tpu.ops       — pure-jax math: boxes, losses, attention, pooling
  grove_tpu.models    — flax modules: CLIP ViT, SAM ViT, LLaMA, grounding head
  grove_tpu.text      — tokenizer-side logic: templates, tagging, splicing
  grove_tpu.parallel  — mesh / sharding / ZeRO-style optimizer sharding
  grove_tpu.data      — host-side video decode + datasets + batching
  grove_tpu.train     — train step + driver
  grove_tpu.infer     — KV-cache generate + sliding-window drivers
  grove_tpu.evals     — host-side metric suites
  grove_tpu.checkpoint— orbax io + torch .bin conversion
"""

__version__ = "0.1.0"
