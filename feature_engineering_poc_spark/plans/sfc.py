"""Space-filling-curve keys: Z-order (Morton) and Hilbert — vectorized numpy.

These are the bit-interleaving kernels behind clustering rewrites
(lakehouse/clustering.py). Everything operates on uint64 numpy arrays —
no per-row Python (BASELINE.json input_hint); they run inside an
Arrow-batched pandas UDF.

Hilbert uses John Skilling's public-domain transpose algorithm
("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004):
axes → transposed Gray-code form → bit-interleave. The Z-order key is
a plain bit interleave of the normalized coordinates.

Key width: d dims × bits ≤ 63 so keys fit a Spark LongType.
"""

from __future__ import annotations

import numpy as np


def _check(dims: int, bits: int) -> None:
    if dims < 1 or dims > 4:
        raise ValueError("1-4 dimensions supported")
    if dims * bits > 63:
        raise ValueError(f"dims*bits must fit a signed long, got {dims}*{bits}")


def interleave_bits(coords: list[np.ndarray], bits: int) -> np.ndarray:
    """Morton/Z-order key. coords[j] is a uint64 array already
    normalized to [0, 2^bits). Bit i of dim j lands at i*d + j."""
    d = len(coords)
    _check(d, bits)
    out = np.zeros(len(coords[0]), dtype=np.uint64)
    for j, c in enumerate(coords):
        c = c.astype(np.uint64)
        for i in range(bits):
            out |= ((c >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * d + j)
    return out


def hilbert_index(coords: list[np.ndarray], bits: int) -> np.ndarray:
    """Hilbert distance of d-dim points, vectorized Skilling transform."""
    d = len(coords)
    _check(d, bits)
    if d == 1:
        return coords[0].astype(np.uint64)
    x = [c.astype(np.uint64).copy() for c in coords]
    m = np.uint64(1 << (bits - 1))

    # Inverse undo excess work (Skilling AxesToTranspose, vectorized:
    # the per-point branch becomes a boolean mask over the batch).
    q = m
    one = np.uint64(1)
    while q > one:
        p = q - one
        for i in range(d):
            mask = (x[i] & q) != 0
            # invert low bits of x[0] where bit set
            x[0] = np.where(mask, x[0] ^ p, x[0])
            # exchange low bits of x[0] and x[i] where bit not set
            t = np.where(~mask, (x[0] ^ x[i]) & p, np.uint64(0))
            x[0] ^= t
            x[i] ^= t
        q >>= one

    # Gray encode
    for i in range(1, d):
        x[i] ^= x[i - 1]
    t = np.zeros_like(x[0])
    q = m
    while q > one:
        mask = (x[d - 1] & q) != 0
        t = np.where(mask, t ^ (q - one), t)
        q >>= one
    for i in range(d):
        x[i] ^= t

    # Interleave the TRANSPOSED form: bit b of x[i] is bit
    # (b*d + (d-1-i)) of the Hilbert index (most-significant dim first).
    out = np.zeros_like(x[0])
    for i in range(d):
        c = x[i]
        for b in range(bits):
            out |= ((c >> np.uint64(b)) & one) << np.uint64(b * d + (d - 1 - i))
    return out


def normalize_to_grid(
    values: np.ndarray, lo: float, hi: float, bits: int
) -> np.ndarray:
    """Scale numeric values from [lo, hi] onto the SFC grid [0, 2^bits)."""
    span = max(hi - lo, 1e-300)
    scaled = (values.astype(np.float64) - lo) / span
    grid = np.clip(scaled * ((1 << bits) - 1), 0, (1 << bits) - 1)
    return grid.astype(np.uint64)


def string_prefix_ordinal(values, nbytes: int = 8) -> np.ndarray:
    """Order-preserving uint64 from a string's first bytes (big-endian).

    Lexicographic order of the strings == numeric order of the
    ordinals, so range predicates on the string map to ranges on the
    grid (unlike hashing, which destroys locality).
    """
    import pandas as pd

    if nbytes != 8:
        raise ValueError("only 8-byte prefixes supported")
    s = pd.Series(values).fillna("").astype(str)
    # encode to UTF-8 (byte order == code-point order), then 'S8'
    # truncates/null-pads each value to 8 bytes; reinterpret the packed
    # buffer as big-endian uint64 — fully vectorized.
    packed = np.asarray(s.str.encode("utf-8").values, dtype="S8")
    return np.frombuffer(packed.tobytes(), dtype=">u8").astype(np.uint64)
