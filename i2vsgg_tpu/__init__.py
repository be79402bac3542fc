"""i2vsgg_tpu — TPU-native framework for adaptive image-to-video scene graph
generation (I2VSGG).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch implementation (AAAI 2022, "Adaptive Image-to-video Scene Graph
Generation via Knowledge Reasoning and Adversarial Learning"):

* Stage A — adversarially domain-adapted Faster R-CNN detector
  (ResNet-50/101 or VGG16 backbone, RPN, instance + bilinear-style
  discriminators with gradient reversal).
* Stage B — embedding-based relation (SGG) head classifying predicates by
  cosine similarity against GloVe-derived semantic embeddings.
* Stage C — host-side video association and vIoU relation metrics.

Design: functional JAX core with static shapes and validity masks, Pallas
kernels for RoIAlign / RoIPool / NMS, a DP `jax.sharding.Mesh` for
multi-chip scaling, and a C++ prefetching input pipeline.
"""

__version__ = "0.1.0"
