"""Config models + loaders (reference parity: config/Models.scala, ConfigLoader.scala)."""

from .models import (
    FeatureTransformerConfig,
    JobConfig,
    OutputSink,
    SourceConfig,
    SourceDefinition,
)
from .loader import SourceRegistry, load_job_config, load_source_registry

__all__ = [
    "FeatureTransformerConfig",
    "JobConfig",
    "OutputSink",
    "SourceConfig",
    "SourceDefinition",
    "SourceRegistry",
    "load_job_config",
    "load_source_registry",
]
