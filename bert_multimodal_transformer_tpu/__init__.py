"""bert_multimodal_transformer_tpu — TPU-native MAG-BERT / MAG-XLNet.

A from-scratch JAX/Flax/Pallas framework with the capability surface of
WasifurRahman/BERT_multimodal_transformer (ACL 2020 "Integrating Multimodal
Information in Large Pretrained Transformers"): the Multimodal Adaptation
Gate injected into BERT and XLNet encoders, fine-tuned for CMU-MOSI/MOSEI
sentiment regression — redesigned for TPU (SPMD data parallelism over a
device mesh, bf16 MXU matmuls, fused Pallas gate kernel, Orbax
checkpointing).
"""

from bert_multimodal_transformer_tpu.config import (
    BertConfig,
    DatasetConfig,
    MeshConfig,
    MultimodalConfig,
    TrainingConfig,
    XLNetConfig,
)
from bert_multimodal_transformer_tpu.models.bert import (
    MagBertForSequenceClassification,
    MagBertModel,
)
from bert_multimodal_transformer_tpu.models.mag import MAG
from bert_multimodal_transformer_tpu.models.xlnet import (
    MagXLNetForSequenceClassification,
    MagXLNetModel,
)
from bert_multimodal_transformer_tpu.training.trainer import (
    TrainState,
    Trainer,
)
from bert_multimodal_transformer_tpu.utils.pretrained import from_pretrained

__version__ = "0.1.0"

__all__ = [
    "BertConfig",
    "DatasetConfig",
    "MAG",
    "MagBertForSequenceClassification",
    "MagBertModel",
    "MagXLNetForSequenceClassification",
    "MagXLNetModel",
    "MeshConfig",
    "MultimodalConfig",
    "TrainState",
    "Trainer",
    "TrainingConfig",
    "XLNetConfig",
    "from_pretrained",
]
