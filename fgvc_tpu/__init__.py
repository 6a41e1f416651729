"""fgvc_tpu — a TPU-native framework for fine-grained pixel-wise video correspondence.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of qianduoduolr/FGVC
(ICCV 2023, "Learning Fine-Grained Features for Pixel-wise Video Correspondences"):

  * a ResNet fine-grained feature encoder (flax) with the reference's stride
    quirks (`/root/reference/mmpt/models/backbones/resnet.py:328`),
  * top-k masked-attention label propagation for point tracking / keypoints /
    VOS (`/root/reference/mmpt/models/common/local_attention.py:267`),
  * mixed self-supervised + synthetic-flow-supervised + adversarial training
    (`/root/reference/mmpt/models/trackers/mixed_tracker.py:237`),
  * TAP-Vid / JHMDB / BADJA / DAVIS evaluation harnesses.

Everything on the compute path is jit-compiled XLA with Pallas kernels for the
hot ops; scaling is expressed with `jax.sharding` over a device Mesh rather
than process-level DDP.
"""

__version__ = "0.1.0"
