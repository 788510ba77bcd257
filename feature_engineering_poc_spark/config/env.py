"""Engine settings from environment variables (C3 parity).

The reference validates six DATABRICKS_* env vars, all required
(config/AppConfig.scala:46-69). Offline, the engine's env surface is
local: every variable has a default, and ``from_env`` reports ALL
missing/invalid variables at once (the reference collects errors the
same way).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    cpus: int = 32
    sf_dir: str = "/root/testdata/sf0.1"
    driver_memory: str = "8g"
    bench_rows: int = 200_000
    target_file_bytes: int = 128 * 1024 * 1024

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "EngineConfig":
        env = dict(os.environ) if env is None else env
        errors: list[str] = []

        def get_int(key: str, default: int) -> int:
            raw = env.get(key)
            if raw is None:
                return default
            try:
                return int(raw)
            except ValueError:
                errors.append(f"{key} must be an integer, got {raw!r}")
                return default

        cfg = cls(
            cpus=get_int("SPARK_GRAFT_CPUS", cls.cpus),
            sf_dir=env.get("SPARK_GRAFT_SF_DIR", cls.sf_dir),
            driver_memory=env.get("SPARK_DRIVER_MEMORY", cls.driver_memory),
            bench_rows=get_int("SPARK_GRAFT_BENCH_ROWS", cls.bench_rows),
            target_file_bytes=get_int("SPARK_GRAFT_TARGET_BYTES", cls.target_file_bytes),
        )
        if cfg.cpus < 1:
            errors.append("SPARK_GRAFT_CPUS must be >= 1")
        if errors:
            raise ValueError("invalid engine environment: " + "; ".join(errors))
        return cfg
