"""Model layer: blocks, bridges, encoder/decoders, and the 5-model registry."""

from lintransunet_tpu.models.blocks import (
    Attention3DBlock,
    ConvPosEmbed3d,
    DownBlock,
    DownEmbedBlock,
    EmbedAttention3DBlock,
    MultiheadLinearAttention,
    PosAttention3DBlock,
    SelfAttentionLayer,
    SolidBlock,
    SpatialAttentionGate,
    TransEncoder,
    UpBlock,
    UpEmbedBlock,
)
from lintransunet_tpu.models.bridges import Bridge, ConnectBridge, InitialBridge, ROIBridge
from lintransunet_tpu.models.packed import prepack_params, prepack_plan
from lintransunet_tpu.models.registry import (
    BottleTransUnet,
    MaskSkipTransUnet,
    MaskTransUnet,
    Model_Dict,
    SkipTransUnet,
    TraditionUnet,
    get_model_dict,
    one_hot_argmax,
)
from lintransunet_tpu.models.unet import Decoder, Encoder, MaskDecoder, ROIDecoder

__all__ = [
    "Attention3DBlock",
    "ConvPosEmbed3d",
    "DownBlock",
    "DownEmbedBlock",
    "EmbedAttention3DBlock",
    "MultiheadLinearAttention",
    "PosAttention3DBlock",
    "SelfAttentionLayer",
    "SolidBlock",
    "SpatialAttentionGate",
    "TransEncoder",
    "UpBlock",
    "UpEmbedBlock",
    "Bridge",
    "ConnectBridge",
    "InitialBridge",
    "ROIBridge",
    "Decoder",
    "Encoder",
    "MaskDecoder",
    "ROIDecoder",
    "TraditionUnet",
    "BottleTransUnet",
    "SkipTransUnet",
    "MaskSkipTransUnet",
    "MaskTransUnet",
    "Model_Dict",
    "get_model_dict",
    "one_hot_argmax",
    "prepack_params",
    "prepack_plan",
]
