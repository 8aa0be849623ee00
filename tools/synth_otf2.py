"""Synthesize an N-location OTF2 archive at arbitrary event volume —
the OTF2 twin of synth_projections.py, emitting the same binary
grammar sources/otf2_native.py parses (and documents): size-prefixed
integers, 0x05 timestamp records, Enter/Leave with the record-length
byte doubling as the region int's size prefix, MPI send/recv records
with size-prefixed field runs.

Each location's .evt writes independently (ProcessPool), so fixture
generation parallelizes like the projections synthesizer.

Usage: python tools/synth_otf2.py OUTDIR NUM_LOCS FRAMES_PER_LOC
"""

from __future__ import annotations

import os
import random
import struct
import sys

N_REGIONS = 8
MSG_SIZES = (64, 80, 160, 212, 1024)
_HEADER = b"\x03\x42" + struct.pack("<QQ", 0, 0)


def _sp(v: int) -> bytes:
    """Size-prefixed little-endian int (the reader's _sp_int inverse)."""
    if v == 0:
        return b"\x01\x00"
    n = (v.bit_length() + 7) // 8
    return bytes([n]) + v.to_bytes(n, "little")


def _rec(t: int, payload: bytes) -> bytes:
    return bytes([t, len(payload)]) + payload


def _ts(ticks: int) -> bytes:
    return b"\x05" + struct.pack("<Q", ticks)


def write_defs(outdir: str, num_locs: int) -> None:
    recs = []
    # ClockProperties: 1 GHz resolution, zero offset
    recs.append(_rec(5, _sp(1_000_000_000) + _sp(0) + _sp(0)))
    # strings: region names then location names
    for i in range(N_REGIONS):
        recs.append(_rec(10, _sp(i) + f"work_{i}".encode() + b"\x00"))
    for loc in range(num_locs):
        recs.append(
            _rec(10, _sp(1000 + loc) + f"rank {loc}".encode() + b"\x00")
        )
    # regions -> name refs
    for i in range(N_REGIONS):
        recs.append(_rec(15, _sp(i) + _sp(i)))
    # locations: ref, name ref, type byte, numEvents, group (1 loc per
    # group = 1 rank per location, thread 0 — the MPI layout)
    for loc in range(num_locs):
        recs.append(
            _rec(14, _sp(loc) + _sp(1000 + loc) + b"\x01" + _sp(0)
                 + _sp(loc))
        )
    with open(os.path.join(outdir, "traces.def"), "wb") as f:
        f.write(_HEADER + b"".join(recs) + b"\x02")


def write_loc_evt(args) -> int:
    outdir, loc, frames, num_locs = args
    rng = random.Random(0xBEEF + loc)
    t = 1000 + loc
    out = [_HEADER]
    n = 0
    for _ in range(frames):
        region = rng.randrange(N_REGIONS)
        size = rng.choice(MSG_SIZES)
        peer = rng.randrange(num_locs)
        t += rng.randrange(1, 20)
        out.append(_ts(t))
        out.append(_rec(0x0E, _sp(peer) + _sp(0) + _sp(7) + _sp(size)))
        # Enter/Leave are single-field records: the record-length byte
        # IS the region int's size prefix, so the payload is raw value
        # bytes (otf2_native.py:_iter_location_rows)
        rbytes = region.to_bytes(max(1, (region.bit_length() + 7) // 8),
                                 "little")
        t += rng.randrange(1, 10)
        out.append(_ts(t))
        out.append(_rec(0x0C, rbytes))  # Enter
        t += rng.randrange(5, 200)
        out.append(_ts(t))
        out.append(_rec(0x0D, rbytes))  # Leave
        n += 3
    out.append(b"\x02")
    with open(os.path.join(outdir, "traces", f"{loc}.evt"), "wb") as f:
        f.write(b"".join(out))
    return n


def synthesize(outdir: str, num_locs: int, frames_per_loc: int) -> int:
    os.makedirs(os.path.join(outdir, "traces"), exist_ok=True)
    write_defs(outdir, num_locs)
    from concurrent.futures import ProcessPoolExecutor

    jobs = [(outdir, loc, frames_per_loc, num_locs) for loc in range(num_locs)]
    if num_locs <= 2:
        return sum(write_loc_evt(j) for j in jobs)
    with ProcessPoolExecutor(max_workers=min(16, num_locs)) as ex:
        return sum(ex.map(write_loc_evt, jobs, chunksize=4))


if __name__ == "__main__":
    outdir, locs, frames = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n = synthesize(outdir, locs, frames)
    print(f"{outdir}: {locs} locations, ~{n} events")
