"""TPU-native multi-view Mask R-CNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
juliuserbach/mulit_view_object_detection (a TF1/Keras multi-view Mask R-CNN
with pose-aware voxel-grid feature fusion): ResNet-FPN backbone, RPN,
box/mask heads, projective unproject/fuse/reproject multi-view geometry,
four grid-fusion modes plus transformer fusion, training and evaluation —
built TPU-first with static shapes, pjit/shard_map parallelism and Pallas
kernels for the gather-bound geometry ops.
"""

__version__ = "0.1.0"

from .config import Config  # noqa: F401
