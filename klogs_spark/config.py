"""Engine configuration — parity with the reference plugin's config surface.

Reference: /root/reference/main.go:111-228 (FLBPluginInit config keys) and
defaults at main.go:30-40. Each field cites the config key it mirrors.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Configuration for the ingest pipeline + sink.

    Mirrors the Fluent Bit plugin config keys (reference README.md:21-42,
    defaults main.go:30-40). ClickHouse connectivity options are kept for the
    optional JDBC sink; the native sink is partitioned Parquet.
    """

    # --- sink batching (reference main.go:37-38, T1 in SURVEY §2.10) ---
    batch_size: int = 10_000          # Batch_Size, main.go:37
    flush_interval_s: int = 60        # Flush_Interval, main.go:38

    # --- field handling (reference main.go:205-213) ---
    force_number_fields: list[str] = field(default_factory=list)  # main.go:207-208
    force_underscores: bool = False   # main.go:210-213

    # --- clickhouse sink options (reference main.go:121-199) ---
    address: str = ""                 # Address
    database: str = "logs"            # Database, main.go:31
    username: str = ""                # Username
    password: str = ""                # Password
    write_timeout: str = "10"        # Write_Timeout, main.go:32
    read_timeout: str = "10"         # Read_Timeout
    dial_timeout_s: int = 10          # main.go:33
    conn_max_lifetime_s: int = 3600   # main.go:34
    max_idle_conns: int = 1           # main.go:35
    max_open_conns: int = 1           # main.go:36
    async_insert: bool = False        # Async_Insert, main.go:181-185
    wait_for_async_insert: bool = False  # Wait_For_Async_Insert, main.go:187-191

    # --- engine-native options (no reference equivalent) ---
    retention_days: int = 30          # TTL, schema.sql:19
    checkpoint_dir: str = ""          # Structured Streaming checkpoint (T2/T4)

    @classmethod
    def from_dict(cls, conf: dict[str, str]) -> "EngineConfig":
        """Build from a flat string map, like FLBPluginConfigKey reads.

        Invalid numeric values fall back to defaults with no error, matching
        the reference's warn-and-default behavior (main.go:168-172).
        """
        cfg = cls()
        def _int(key: str, default: int) -> int:
            try:
                return int(conf[key])
            except (KeyError, ValueError):
                return default

        cfg.batch_size = _int("batch_size", cfg.batch_size)
        cfg.flush_interval_s = _int("flush_interval", cfg.flush_interval_s)
        # comma-split of config list, main.go:208
        raw = conf.get("force_number_fields", "")
        cfg.force_number_fields = [s for s in raw.split(",") if s]
        cfg.force_underscores = conf.get("force_underscores", "").lower() == "true"
        cfg.async_insert = conf.get("async_insert", "").lower() == "true"
        cfg.wait_for_async_insert = (
            conf.get("wait_for_async_insert", "").lower() == "true"
        )
        for k in ("address", "database", "username", "password", "checkpoint_dir"):
            if k in conf:
                setattr(cfg, k, conf[k])
        cfg.retention_days = _int("retention_days", cfg.retention_days)
        return cfg
