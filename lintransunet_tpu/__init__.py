"""LinTransUNet-TPU: a TPU-native (JAX/XLA/Pallas) volumetric segmentation framework.

A from-scratch rebuild of the capabilities of freshman97/LinTransUNet
("Dynamic Linear Transformer for 3D Biomedical Image Segmentation"):
a 3D conv UNet whose decoder routes mask-guided ROI crops of each skip
connection through O(N) linear-attention transformer blocks, with a fused
sliding-window inference engine, a full loss zoo, CT data pipelines, and
SPMD data parallelism over a TPU mesh.

Layout convention: activations are channels-last ``(N, H, W, D, C)``
(TPU/XLA native). The reference uses channels-first ``(N, C, H, W, D)``;
conversion helpers live in :mod:`lintransunet_tpu.compat`.
"""

__version__ = "0.1.0"
