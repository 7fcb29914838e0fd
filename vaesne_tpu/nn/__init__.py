"""Neural building blocks: transformer primitives and modality towers."""

from .layers import (
    LN_EPS,
    MLP,
    MultiHeadAttention,
    PatchEmbedding,
    SingleLayerMLP,
    SinusoidalEmbedding,
    SinusoidalMLPEmbedding,
    TransformerBlock,
    TransformerStack,
    sinusoidal_embedding_2d,
)
from .extras import (
    GumbelSoftmax,
    LearnableFourierEncoding,
    RelativeMultiHeadAttention,
    RelativePosition,
    TransformerModel,
    flatten,
    reshape,
)
from .photometric_layers import (
    PhotometricTransformerDecoder,
    PhotometricTransformerEncoder,
)
from .spectra_layers import SpectraTransformerDecoder, SpectraTransformerEncoder
from .image_layers import (
    HostImgTransformerDecoder,
    HostImgTransformerDecoderHybrid,
    HostImgTransformerEncoder,
)

__all__ = [
    "LN_EPS",
    "MLP",
    "MultiHeadAttention",
    "PatchEmbedding",
    "SingleLayerMLP",
    "SinusoidalEmbedding",
    "SinusoidalMLPEmbedding",
    "TransformerBlock",
    "TransformerStack",
    "sinusoidal_embedding_2d",
    "GumbelSoftmax",
    "LearnableFourierEncoding",
    "RelativeMultiHeadAttention",
    "RelativePosition",
    "TransformerModel",
    "flatten",
    "reshape",
    "PhotometricTransformerDecoder",
    "PhotometricTransformerEncoder",
    "SpectraTransformerDecoder",
    "SpectraTransformerEncoder",
    "HostImgTransformerDecoder",
    "HostImgTransformerDecoderHybrid",
    "HostImgTransformerEncoder",
]
