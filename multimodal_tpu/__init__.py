"""multimodal_tpu: a TPU-native multimodal modeling framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
TorchMultimodal (facebookresearch/multimodal): composable building blocks,
model families (CLIP, FLAVA, ALBEF, BLIP-2, CoCa, MDETR, MAE, VideoGPT,
VQ-VAE, Omnivore), on-device fused transforms, a diffusion sub-framework,
and SPMD distributed training over TPU meshes.

Design principles (TPU-first, not a port):
  - compute path: jit-compiled XLA + Pallas kernels, bf16 on the MXU
  - state is explicit: EMA codebooks, momentum encoders, queues, and KV
    caches are pytrees threaded through pure functions
  - parallelism: jax.sharding Mesh + NamedSharding (dp/fsdp/tp axes),
    collectives via shard_map, differentiable all-gather for global-batch
    contrastive losses
"""

__version__ = "0.1.0"
