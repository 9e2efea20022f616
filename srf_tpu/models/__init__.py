from srf_tpu.models.cnn import CNNEncoder, CNNStrideEncoder
from srf_tpu.models.decoder import DecoderBlock, EncoderMFBlock
from srf_tpu.models.layers import (
    ConvFrontEnd,
    EncoderBlock,
    MultiHeadAttention,
    PointWiseFeedForward,
)
from srf_tpu.models.lstm import LstmEncoder
from srf_tpu.models.registry import build_model
from srf_tpu.models.srf import SequenceRouter
from srf_tpu.models.stf import ConvEncoder

__all__ = [
    "CNNEncoder", "CNNStrideEncoder", "ConvEncoder", "ConvFrontEnd",
    "DecoderBlock", "EncoderBlock", "EncoderMFBlock", "LstmEncoder",
    "MultiHeadAttention", "PointWiseFeedForward", "SequenceRouter",
    "build_model",
]
