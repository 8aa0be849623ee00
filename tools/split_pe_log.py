"""Pre-split an oversized Projections PE log into parse-parallel
shards — the skewed-PE ingestion mitigation (SCALING.md round-7
ingestion rung's named next constraint).

Gzip is not seekable, so ONE hot PE's multi-GB ``.log.gz`` parses as
ONE task and bounds the ingest tail no matter how many cores are
idle. This tool re-shards such a file into ``n`` line-order slices
named ``{stem}.{pe}.{k}of{n}.log.gz`` (1-based ``k``), which:

* still match the reader's ``*.log.gz`` glob, so no read-path change;
* parse as ``n`` INDEPENDENT tasks — the chunked line dispatch is
  stateless (property-tested under arbitrary segmentation), so a
  shard needs no context from its neighbors;
* keep per-PE event order and id uniqueness: the reader assigns
  ``seq = (pe << 40) + ((k-1) << 28) + i`` to shard ``k``'s events
  (≤ 2^28 events/shard, ≤ 4096 shards/PE), monotone across shards
  because shards are line-order slices;
* apply the trailing-Computation repair (reference
  projections_reader.py:792-795) only on shard ``n`` — a mid-shard
  ends mid-stream by construction, not at the PE's end-of-trace.

Run it where the logs land (object-store staging, or the Charm++ side
writes shards natively at rotation size). The split is one sequential
decompress+recompress pass over the hot file — paid ONCE, off the
query path, to unlock n-way parse parallelism on every later read.
The final shard is never left empty (trailing lines fold into it).

Usage: python tools/split_pe_log.py FILE.log.gz N_SHARDS
"""

from __future__ import annotations

import gzip
import os
import re
import sys


def split_pe_log(path: str, n_shards: int) -> list[str]:
    """Split ``path`` (``{stem}.{pe}.log[.gz]``) into ``n_shards``
    line-order slices beside it; returns the shard paths."""
    if not 1 < n_shards <= 4096:
        raise ValueError("n_shards must be in (1, 4096]")
    base = os.path.basename(path)
    m = re.search(r"^(.*)\.(\d+)\.log(\.gz)?$", base)
    if not m:
        raise ValueError(f"{base}: expected <stem>.<pe>.log[.gz]")
    stem, pe = m.group(1), m.group(2)
    opener = gzip.open if path.endswith(".gz") else open
    # two streaming passes — NEVER the whole file in memory (a 50%-hot
    # 120M-event log is ~264M lines ≈ 20 GB as a Python list; the
    # first formulation did exactly that and the x1m rung measured it)
    n_lines = 0
    with opener(path, "rt") as f:
        for _ in f:
            n_lines += 1
    if n_lines < n_shards:
        raise ValueError(f"{n_lines} lines < {n_shards} shards")
    per = n_lines // n_shards
    outdir = os.path.dirname(path) or "."
    out_paths = []
    with opener(path, "rt") as f:
        for k in range(1, n_shards + 1):
            take = per if k < n_shards else n_lines - per * (n_shards - 1)
            shard = os.path.join(
                outdir, f"{stem}.{pe}.{k}of{n_shards}.log.gz"
            )
            with gzip.open(shard, "wt") as out:
                for _ in range(take):
                    out.write(f.readline())
            out_paths.append(shard)
    return out_paths


if __name__ == "__main__":
    paths = split_pe_log(sys.argv[1], int(sys.argv[2]))
    print(f"{len(paths)} shards: {paths[0]} .. {paths[-1]}")
