"""Transformer factory — string-dispatched registry (F1).

Parity: features/TransformerFactory.scala:20-38 (same names, unknown
name raises).
"""

from __future__ import annotations

from . import transformers as t

TRANSFORMER_REGISTRY: dict[str, type[t.FeatureTransformer]] = {
    "TransactionIndicatorDeriver": t.TransactionIndicatorDeriver,
    "TransactionDatetimeDeriver": t.TransactionDatetimeDeriver,
    "TransactionStatusDeriver": t.TransactionStatusDeriver,
    "TransactionChannelDeriver": t.TransactionChannelDeriver,
    "TransactionValueDeriver": t.TransactionValueDeriver,
    "TransactionModeDeriver": t.TransactionModeDeriver,
    "TransactionCategoryDeriver": t.TransactionCategoryDeriver,
    "UserSpendAggregator": t.UserSpendAggregator,
    "UserMonthlyTransactionCounter": t.UserMonthlyTransactionCounter,
    "UserCategoricalSpendAggregator": t.UserCategoricalSpendAggregator,
}


def get_transformer(name: str, params: dict | None = None) -> t.FeatureTransformer:
    cls = TRANSFORMER_REGISTRY.get(name)
    if cls is None:
        raise ValueError(f"Unknown transformer name: {name}")
    return cls(params or {})
