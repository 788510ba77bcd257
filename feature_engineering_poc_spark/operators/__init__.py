"""Feature transformers (reference parity, T1-T10) + factory + pipeline runner."""

from .factory import TRANSFORMER_REGISTRY, get_transformer
from .runner import run_pipeline
from .transformers import (
    TransactionCategoryDeriver,
    TransactionChannelDeriver,
    TransactionDatetimeDeriver,
    TransactionIndicatorDeriver,
    TransactionModeDeriver,
    TransactionStatusDeriver,
    TransactionValueDeriver,
    UserCategoricalSpendAggregator,
    UserMonthlyTransactionCounter,
    UserSpendAggregator,
)

__all__ = [
    "TRANSFORMER_REGISTRY",
    "get_transformer",
    "run_pipeline",
    "TransactionIndicatorDeriver",
    "TransactionDatetimeDeriver",
    "TransactionStatusDeriver",
    "TransactionChannelDeriver",
    "TransactionValueDeriver",
    "TransactionModeDeriver",
    "TransactionCategoryDeriver",
    "UserSpendAggregator",
    "UserMonthlyTransactionCounter",
    "UserCategoricalSpendAggregator",
]
