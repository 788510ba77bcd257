"""Config loaders — parity with config/ConfigLoader.scala.

- ``load_job_config``: JSON file → JobConfig; malformed JSON or missing
  required fields raise (ConfigLoader.scala:21-33,
  JobConfigLoaderSpec.scala:50-59).
- ``load_source_registry``: recursive walk of a directory for *.json
  (ConfigLoader.scala:56-88); the first parse error aborts the whole
  load (:76-79); an empty directory yields an empty registry
  (SourceRegistrySpec.scala:72-90); a missing directory raises.
"""

from __future__ import annotations

import json
from pathlib import Path

from .models import SourceDefinition


class SourceRegistry:
    """(name, version) → SourceDefinition (ConfigLoader.scala:40-45)."""

    def __init__(self, sources: dict[tuple[str, str], SourceDefinition]):
        self._sources = sources

    def get(self, name: str, version: str | None = None) -> SourceDefinition | None:
        if version is not None:
            return self._sources.get((name, str(version)))
        # latest version when unspecified (lexicographic max, like the
        # reference's resolution fallback in JobRunner.scala:99-106)
        matches = [sd for (n, _v), sd in self._sources.items() if n == name]
        return max(matches, key=lambda s: s.version) if matches else None

    def __len__(self) -> int:
        return len(self._sources)


def load_job_config(path: str | Path):
    from .models import JobConfig

    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"job config not found: {p}")
    return JobConfig.from_dict(json.loads(p.read_text()))


def load_source_registry(directory: str | Path) -> SourceRegistry:
    d = Path(directory)
    if not d.is_dir():
        raise FileNotFoundError(f"source catalog directory not found: {d}")
    sources: dict[tuple[str, str], SourceDefinition] = {}
    for f in sorted(d.rglob("*.json")):
        data = json.loads(f.read_text())  # first parse error aborts everything
        sd = SourceDefinition.from_dict(data, ctx=str(f))
        sources[(sd.name, sd.version)] = sd
    return SourceRegistry(sources)
