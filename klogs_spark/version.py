"""Build/version metadata — parity with pkg/version/version.go:12-43.

The reference stamps Version/Revision/Branch/BuildUser/BuildDate at link
time and prints them through a template (version.go:23-48); a Python wheel
can't link-stamp, so the fields resolve from environment overrides (CI sets
them) with git fallbacks, plus the runtime versions a Spark deployment
actually cares about (Python / PySpark mirror GoVersion, version.go:18).
"""

from __future__ import annotations

import os
import platform
import subprocess

VERSION = "2.0.0"


def _git(*args: str) -> str:
    try:
        out = subprocess.run(
            ["git", *args], capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


def info() -> dict[str, str]:
    """Structured form (version.go Info())."""
    try:
        import pyspark
        spark_version = pyspark.__version__
    except Exception:  # pragma: no cover
        spark_version = "unknown"
    return {
        "version": os.environ.get("KLOGS_SPARK_VERSION", VERSION),
        "revision": os.environ.get("KLOGS_SPARK_REVISION",
                                   _git("rev-parse", "--short", "HEAD")),
        "branch": os.environ.get("KLOGS_SPARK_BRANCH",
                                 _git("rev-parse", "--abbrev-ref", "HEAD")),
        "build_user": os.environ.get("KLOGS_SPARK_BUILD_USER", ""),
        "build_date": os.environ.get("KLOGS_SPARK_BUILD_DATE", ""),
        "python_version": platform.python_version(),
        "pyspark_version": spark_version,
    }


def print_info(program: str = "klogs_spark") -> str:
    """Rendered form (version.go Print(), versionInfoTmpl:23-28)."""
    i = info()
    return (
        f"{program}, version {i['version']} "
        f"(branch: {i['branch']}, revision: {i['revision']})\n"
        f"  build user:       {i['build_user']}\n"
        f"  build date:       {i['build_date']}\n"
        f"  python version:   {i['python_version']}\n"
        f"  pyspark version:  {i['pyspark_version']}"
    )
