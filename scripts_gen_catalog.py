"""Regenerate QUERIES.md — the user-facing catalog of every externally
hash-checked query — from the SPECS registries. Run after adding queries:

    python scripts_gen_catalog.py
"""

import sys

sys.path.insert(0, ".")

from klogs_spark.queries import _merged_specs  # noqa: E402

TITLES = {
    "logs": "Log-store reads (reference query surface)",
    "table": "Table lifecycle (manifests, COW, time travel, clone)",
    "stream": "Structured Streaming",
    "ingest": "Ingest pipelines & formats",
    "sources": "Tail/enrichment sources",
    "tpch": "TPC-H analytics",
    "agg": "Aggregation shapes",
    "window": "Window functions",
    "join": "Join shapes",
    "setop": "Set operations",
    "events": "Event analytics & anomaly detection",
    "dedup": "Deduplication family",
    "text": "Text analysis & LLM-data operators",
    "ann": "Similarity search / ANN",
    "similarity": "Similarity selection",
    "embedding": "Embedding statistics",
    "multimodal": "Multimodal (real codecs)",
    "pipeline": "End-to-end pipeline compositions",
    "sample": "Sampling & packing",
}
ORDER = list(TITLES)


def main() -> None:
    specs = _merged_specs()
    groups: dict = {}
    for n, s in specs.items():
        groups.setdefault(n.split("_", 1)[0], []).append((n, s))
    lines = [
        "# Query catalog",
        "",
        "Every externally hash-checked query the engine ships — one row per",
        "`__spark_entry__.queries()` entry, grouped by surface. Each has a",
        "DuckDB oracle (`oracle_sql()`) the driver verifies value-for-value;",
        "run any of them with `python -m klogs_spark explain <name>` to see",
        "its optimized plan. Generated from the SPECS registries; regenerate",
        "with `python scripts_gen_catalog.py` after adding queries.",
        "",
    ]
    for g in ORDER + sorted(set(groups) - set(ORDER)):
        if g not in groups:
            continue
        lines.append(f"## {TITLES.get(g, g)} ({len(groups[g])})")
        lines += ["", "| query | what it pins |", "|---|---|"]
        for n, s in sorted(groups[g]):
            lines.append(f"| `{n}` | {' '.join((s.doc or '').split())} |")
        lines.append("")
    open("QUERIES.md", "w").write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(specs)} queries in {len(groups)} groups")


if __name__ == "__main__":
    main()
