"""Greedy first-fit-decreasing bin packing over FILE METADATA.

Compaction planning never touches data rows: the planner consumes
manifest entries (path, bytes, rows) — a metadata-scale problem even
for a 10^12-sequence table — and emits target-size bins. The rewrite
job then reads exactly the binned files.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Bin:
    partition: str
    files: list[str] = field(default_factory=list)
    bytes: int = 0
    rows: int = 0

    def add(self, path: str, nbytes: int, nrows: int) -> None:
        self.files.append(path)
        self.bytes += nbytes
        self.rows += nrows


def pack_bins(
    entries: list[tuple[str, int, int]],
    partition: str,
    target_bytes: int,
) -> list[Bin]:
    """FFD pack ``(path, bytes, rows)`` into bins of ~target_bytes."""
    bins: list[Bin] = []
    for path, nbytes, nrows in sorted(entries, key=lambda e: -e[1]):
        placed = False
        for b in bins:
            if b.bytes + nbytes <= target_bytes:
                b.add(path, nbytes, nrows)
                placed = True
                break
        if not placed:
            b = Bin(partition)
            b.add(path, nbytes, nrows)
            bins.append(b)
    return bins
