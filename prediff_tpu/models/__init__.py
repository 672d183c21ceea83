from .layers import (
    PosEmbed,
    PositionwiseFFN,
    PatchMerging3D,
    Upsample3DLayer,
    TimeEmbedLayer,
    TimeEmbedResBlock,
    timestep_embedding,
)
from .cuboid_attention import CuboidSelfAttentionLayer, StackCuboidSelfAttentionBlock
from .patterns import CuboidSelfAttentionPatterns, CuboidCrossAttentionPatterns
from .unet import CuboidTransformerUNet
from .vae import AutoencoderKL, Encoder, Decoder
from .alignment import NoisyCuboidTransformerEncoder, AttentionPool3d
