"""Flamegraph folded-stack file sink.

`flamegraph.pl` / speedscope / inferno all consume one line per calling
context: ``stack;frames;joined value``. The folded frame itself is tiny
(one row per distinct call path), so a driver-side text write is the
right shape at any trace scale — the heavy aggregation happened in
:func:`pipit_spark.operators.cct.folded_stacks`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_folded(stacks: DataFrame, path: str) -> str:
    """Write a ``folded_stacks`` frame as a flamegraph.pl-format text
    file (``stack value`` per line, deterministic stack order). Values
    are emitted as integers when integral (the common ns case) so the
    file round-trips through tools that parse sample counts."""
    rows = sorted(
        (r["stack"], r["value"]) for r in stacks.collect()
    )
    with open(path, "w") as f:
        for stack, value in rows:
            v = int(value) if float(value).is_integer() else value
            f.write(f"{stack} {v}\n")
    return path
