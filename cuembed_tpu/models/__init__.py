"""Model layer: EmbeddingBag module and a DLRM-style recommender tower.

The reference ships only a PyTorch ``autograd.Function`` example
(``examples/pytorch/cuembed_pyt.py``); here the framework integration is a
small functional model zoo: :class:`EmbeddingBag` (the ``nn.EmbeddingBag``
analog backed by the Pallas/XLA lookup) and :class:`DLRM` (multi-table
embeddings + dense MLPs + feature interaction), which is also the flagship
model for the benchmark entrypoint and the multi-chip dry run.
"""

from cuembed_tpu.models.embedding_bag import EmbeddingBag
from cuembed_tpu.models.dlrm import DLRM, DLRMConfig
from cuembed_tpu.models.qr_embedding import QREmbeddingBag

__all__ = ["EmbeddingBag", "DLRM", "DLRMConfig", "QREmbeddingBag"]
