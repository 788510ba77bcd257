"""Planning utilities: bin packing and space-filling-curve keys."""

from .binpack import Bin, pack_bins

__all__ = ["Bin", "pack_bins"]
