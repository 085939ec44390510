from coot_videotext_tpu.models.configs import (
    ActivationConfig, ActivationConst, InitTypesConst, MLPConfig,
    NormalizationConfig, NormalizationConst, PoolerConfig, PoolerConst,
    PositionalEncodingConst, ResidualsEnum, TransformerConfig,
    TransformerEncoderConfig, TransformerTypesConst)
from coot_videotext_tpu.models.layers import (
    MLP, CootLayerNorm, LearnableClsToken, PositionalEncodingSinCos,
    TorchLayerNorm, make_activation, make_initializer, make_normalization,
    sincos_positional_encoding)
from coot_videotext_tpu.models.attention import (
    MultiHeadAttention, PointwiseFeedForward, TransformerDecoder,
    TransformerEncoder, TransformerEncoderLayer, masked_softmax)
from coot_videotext_tpu.models.poolers import (
    GenPool, MultiGenPool, TemporalAvgPool, TemporalAvgPoolMasked,
    make_pooler)
from coot_videotext_tpu.models.transformer import CootTransformer
from coot_videotext_tpu.models.retrieval import (
    RetrievalModel, RetrievalNetworksConst)

__all__ = [
    "ActivationConfig", "ActivationConst", "InitTypesConst", "MLPConfig",
    "NormalizationConfig", "NormalizationConst", "PoolerConfig", "PoolerConst",
    "PositionalEncodingConst", "ResidualsEnum", "TransformerConfig",
    "TransformerEncoderConfig", "TransformerTypesConst",
    "MLP", "CootLayerNorm", "LearnableClsToken", "PositionalEncodingSinCos",
    "TorchLayerNorm", "make_activation", "make_initializer",
    "make_normalization", "sincos_positional_encoding",
    "MultiHeadAttention", "PointwiseFeedForward", "TransformerDecoder",
    "TransformerEncoder", "TransformerEncoderLayer", "masked_softmax",
    "GenPool", "MultiGenPool", "TemporalAvgPool",
    "TemporalAvgPoolMasked", "make_pooler",
    "CootTransformer", "RetrievalModel", "RetrievalNetworksConst",
]
