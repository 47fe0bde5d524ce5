"""se3conv3d_tpu: TPU-native local SE(3)-equivariant point-cloud convolutions.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
SE3Conv3D reference library (PyTorch + custom CUDA): locally
SE(3)-equivariant continuous point convolutions over PCA-sampled local
reference frames, with a point-hierarchy model zoo (FPN seg-UNets,
classification nets), data pipelines and a sharded training harness.
"""

__version__ = "0.1.0"

from . import core, data, nn, models, ops, parallel, train, utils
