"""Skewed-PE ingestion rung: one HOT PE holding ~50% of all events —
the adversarial shape for gzip-bound ingest (SCALING.md round-7
ingestion rung's named next constraint: per-PE decompression is
serial, so one hot file bounds the read's tail no matter how many
cores idle).

Three measurements per rung, same fixture volume as the even ladder:

1. even      — the round-7 ladder's balanced fixture (control)
2. skewed    — 50% of frames on PE 0, rest even (the tail-bound case)
3. mitigated — the same skewed fixture after tools/split_pe_log.py
               re-shards the hot log into line-order slices (each
               shard parses as an independent task; reader assigns
               (pe<<40)+((k-1)<<28) id bases and applies the
               trailing repair on the last shard only; shard≡whole
               bit-equality is pytest-pinned)

Steady-state pass-2 read times (pass 1 pays codegen/page cache), one
JSON line per variant.

Usage: PYTHONPATH=. python tools/skewed_ingest_rung.py [x100k|x1m]
         [n_shards]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.split_pe_log import split_pe_log  # noqa: E402
from tools.synth_projections import synthesize  # noqa: E402

CONFIGS = {  # same totals as tools/ladder_ingest.py RUNGS
    "x100k": (32, 85_000),
    "x1m": (64, 425_000),
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "x100k"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pes, frames = CONFIGS[tag]

    from pipit_spark.session import get_spark
    from pipit_spark.sources.projections import read_projections

    spark = get_spark(app_name="skewed-ingest-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # single-pass mode for the x1m rung, where reads run minutes and
    # JVM warmup is already amortized (set SKEW_RUNG_PASSES=1)
    passes = int(os.environ.get("SKEW_RUNG_PASSES", "2"))

    def timed_read(outdir):
        n = sec = None
        for _ in range(passes):
            t0 = time.perf_counter()
            n = read_projections(spark, outdir).count()
            sec = time.perf_counter() - t0
        return n, sec

    variants = []

    even_dir = f"/tmp/skewrung_even_{tag}"
    if not os.path.exists(os.path.join(even_dir, "synth.prj.sts")):
        synthesize(even_dir, pes, frames)
    variants.append(("even", even_dir))

    skew_dir = f"/tmp/skewrung_hot_{tag}"
    if not os.path.exists(os.path.join(skew_dir, "synth.prj.sts")):
        synthesize(skew_dir, pes, frames, hot_frac=0.5)
    variants.append(("skewed", skew_dir))

    mit_dir = f"/tmp/skewrung_mit_{tag}"
    if not os.path.exists(os.path.join(mit_dir, "synth.prj.sts")):
        shutil.copytree(skew_dir, mit_dir)
        t0 = time.perf_counter()
        split_pe_log(os.path.join(mit_dir, "synth.prj.0.log.gz"), n_shards)
        os.remove(os.path.join(mit_dir, "synth.prj.0.log.gz"))
        print(json.dumps({
            "stage": "split_hot_pe", "shards": n_shards,
            "sec": round(time.perf_counter() - t0, 2),
        }))
    variants.append((f"mitigated_{n_shards}sh", mit_dir))

    base = None
    for name, outdir in variants:
        n, sec = timed_read(outdir)
        rate = n / sec
        if name == "even":
            base = sec
        print(json.dumps({
            "variant": name, "rung": tag, "pes": pes, "events": n,
            "read_sec": round(sec, 2), "events_per_sec": round(rate),
            "vs_even": round(sec / base, 2) if base else None,
        }))


if __name__ == "__main__":
    main()
