from .spec import ModelSpec, NeighborhoodProvider
from .encoder import Encoder, PatchEncoder
from .decoder import Decoder, FPNDecoder, PatchDecoder
from .seg_unet import FPNSegUNet, SegUNet
from .class_net import ClassNet
from .presets import CLASS_PRESETS, SEG_PRESETS, get_model_spec, mlp_gelu_conv
from .minkunet import MinkUNet34A
