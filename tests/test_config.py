"""EngineConfig parsing — warn-and-default behavior (main.go:168-172)."""

from klogs_spark.config import EngineConfig


def test_defaults_match_reference():
    cfg = EngineConfig()
    assert cfg.batch_size == 10_000          # main.go:37
    assert cfg.flush_interval_s == 60        # main.go:38
    assert cfg.max_idle_conns == 1           # main.go:35
    assert cfg.max_open_conns == 1           # main.go:36
    assert cfg.dial_timeout_s == 10          # main.go:33
    assert cfg.conn_max_lifetime_s == 3600   # main.go:34
    assert cfg.retention_days == 30          # schema.sql:19
    assert not cfg.async_insert and not cfg.wait_for_async_insert


def test_from_dict_parses_and_splits():
    cfg = EngineConfig.from_dict(
        {
            "batch_size": "500",
            "flush_interval": "5",
            "force_number_fields": "a,b.c,d",
            "force_underscores": "TRUE",
            "async_insert": "true",
            "database": "mydb",
        }
    )
    assert cfg.batch_size == 500
    assert cfg.flush_interval_s == 5
    assert cfg.force_number_fields == ["a", "b.c", "d"]  # comma split, main.go:208
    assert cfg.force_underscores and cfg.async_insert
    assert cfg.database == "mydb"


def test_invalid_values_fall_back_to_defaults():
    # warn-and-default, main.go:168-172
    cfg = EngineConfig.from_dict({"batch_size": "not-a-number",
                                  "flush_interval": ""})
    assert cfg.batch_size == 10_000
    assert cfg.flush_interval_s == 60
    # empty force list -> no phantom empty-string key
    assert EngineConfig.from_dict({"force_number_fields": ""}).force_number_fields == []


def test_version_info_renders():
    from klogs_spark.version import info, print_info

    i = info()
    assert i["version"] and i["pyspark_version"]
    text = print_info("klogs_spark")
    assert "klogs_spark, version" in text and "pyspark version" in text


def test_version_flag_writes_stdout_not_stderr(capsys):
    """`klogs_spark --version | ...` scripting needs stdout (the original
    parser.exit(message=...) wrote stderr)."""
    import pytest

    from klogs_spark.__main__ import main

    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code in (0, None)
    captured = capsys.readouterr()
    assert "version" in captured.out
    assert captured.err == ""
