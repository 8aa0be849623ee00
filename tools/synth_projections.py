"""Synthesize an N-PE Charm++ Projections log directory at arbitrary
event volume — the ingestion-scale fixture the golden ping-pong trace
(2 PEs, 120 events) cannot provide.

Format per the public Projections trace spec as exercised by the
reference's reader (pipit/readers/projections_reader.py): one ``.sts``
metadata file plus one gzipped text log per PE. Each PE's log is a
deterministic (seeded by PE id) stream of BEGIN/END_PROCESSING frames
nested under Computation, with CREATION sends, MESSAGE_RECV instants,
and BEGIN/END_IDLE gaps mixed in at fixed ratios — the record mix an
actual Charm++ run emits, at whatever scale the ladder asks for.

The generator writes each PE's log independently, so fixture
generation itself parallelizes (ProcessPool) — synthesizing the
100x rung takes seconds, not the minutes a naive single-process
writer would.

Usage: python tools/synth_projections.py OUTDIR NUM_PES FRAMES_PER_PE
"""

from __future__ import annotations

import gzip
import os
import random
import sys

N_ENTRIES = 8  # distinct entry methods
MSG_SIZES = (64, 80, 160, 212, 1024)


def write_sts(outdir: str, num_pes: int) -> None:
    lines = [
        "PROJECTIONS_ID ",
        "VERSION 11.0",
        "TOTAL_PHASES 1",
        'MACHINE "synthetic"',
        f"PROCESSORS {num_pes}",
        "TOTAL_CHARES 2",
        f"TOTAL_EPS {N_ENTRIES}",
        "TOTAL_MSGS 1",
        "TOTAL_PSEUDOS 0",
        "TOTAL_EVENTS 0",
        'CHARE 0 "Main" -1',
        'CHARE 1 "Worker" -1',
    ]
    for e in range(N_ENTRIES):
        lines.append(f'ENTRY CHARE {e} "work_{e}(Msg* m)" {e % 2} 0')
    lines.append("MESSAGE 0 64")
    lines.append("END\n")
    with open(os.path.join(outdir, "synth.prj.sts"), "w") as f:
        f.write("\n".join(lines))


def write_pe_log(args) -> int:
    outdir, pe, frames = args
    rng = random.Random(0xC0FFEE + pe)
    path = os.path.join(outdir, f"synth.prj.{pe}.log.gz")
    t = 1000 + pe  # µs clock, per-PE skew
    n_lines = 0
    with gzip.open(path, "wt") as f:
        f.write(f"PROJECTIONS-RECORD {frames * 5 + 2}\n")
        f.write(f"6 {t}\n")  # BEGIN_COMPUTATION
        event_seq = 0
        for i in range(frames):
            ep = rng.randrange(N_ENTRIES)
            size = rng.choice(MSG_SIZES)
            src = rng.randrange(1000)
            # a send (CREATION), the receive instant, then the
            # processing frame it triggers; occasional idle gap
            t += rng.randrange(1, 20)
            f.write(f"1 0 {ep} {t} {event_seq} {pe} {size} {t}\n")
            t += rng.randrange(1, 10)
            f.write(f"10 0 {t} {event_seq} {src} {size}\n")
            t += rng.randrange(1, 10)
            f.write(
                f"2 0 {ep} {t} {event_seq} {src} {size} 0 0\n"
            )
            t += rng.randrange(5, 200)  # frame duration
            f.write(f"3 0 {ep} {t} {event_seq} {src} {size} 0 0\n")
            event_seq += 1
            n_lines += 4
            if rng.random() < 0.2:
                t += 1
                f.write(f"14 {t} {pe}\n")  # BEGIN_IDLE
                t += rng.randrange(1, 50)
                f.write(f"15 {t} {pe}\n")  # END_IDLE
                n_lines += 2
        t += 5
        f.write(f"7 {t}\n")  # END_COMPUTATION
    return n_lines + 2


def synthesize(
    outdir: str,
    num_pes: int,
    frames_per_pe: int,
    hot_frac: float | None = None,
) -> int:
    """Write the fixture; returns total log lines (≈ parsed events).

    ``hot_frac`` makes PE 0 a HOT PE holding that fraction of the
    TOTAL frame budget (num_pes · frames_per_pe), the rest split
    evenly — the adversarial shape for gzip-bound ingestion, where
    one unsplittable log bounds the parse tail (skew rung,
    SCALING.md)."""
    os.makedirs(outdir, exist_ok=True)
    write_sts(outdir, num_pes)
    from concurrent.futures import ProcessPoolExecutor

    if hot_frac is None:
        frames = [frames_per_pe] * num_pes
    else:
        total = num_pes * frames_per_pe
        hot = int(total * hot_frac)
        rest = (total - hot) // max(1, num_pes - 1)
        frames = [hot] + [rest] * (num_pes - 1)
    jobs = [(outdir, pe, frames[pe]) for pe in range(num_pes)]
    if num_pes <= 2:
        return sum(write_pe_log(j) for j in jobs)
    with ProcessPoolExecutor(max_workers=min(16, num_pes)) as ex:
        return sum(ex.map(write_pe_log, jobs, chunksize=4))


if __name__ == "__main__":
    outdir, num_pes, frames = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    hot = float(sys.argv[4]) if len(sys.argv) > 4 else None
    n = synthesize(outdir, num_pes, frames, hot_frac=hot)
    print(f"{outdir}: {num_pes} PEs, ~{n} log lines"
          + (f" (hot PE 0: {hot:.0%} of frames)" if hot else ""))
