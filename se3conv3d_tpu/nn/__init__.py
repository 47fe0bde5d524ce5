from .conv import ConvFactory, PNEConv
from .norm import MaskedBatchNorm, MaskedGroupNorm
from .blocks import (
    DropPath,
    ResConvNeXt,
    ResNetB,
    ResNetFormer,
    SkipConnection,
    TorchLinear,
)
from .icosphere import icosphere_points
from .attention import LoRAttConv, MultiHeadAttConv
