"""Synthesize an HPCToolkit v4.0 database at arbitrary sample volume —
the third binary-reader scale fixture (with synth_projections.py and
synth_otf2.py). Emits the byte layout sources/hpctoolkit.py parses:

* ``meta.db``  — 8-section header; IdNames kinds, a context tree of
  function nodes under one entry context, a Functions array;
* ``profile.db`` — profile-info array with hierarchical identifier
  tuples (RANK/THREAD);
* ``trace.db`` — context-trace headers + per-thread sample lines of
  12-byte (u64 ts, u32 ctxId) elements.

Samples per thread are a seeded random walk over the context tree, so
consecutive samples usually share a prefix and the reader's LCA
reconstruction emits a realistic Enter/Leave mix (≈2 events per
context switch at depth 2).

Usage: python tools/synth_hpctoolkit.py OUTDIR NUM_THREADS SAMPLES_PER
"""

from __future__ import annotations

import os
import random
import struct
import sys

import numpy as np

N_FUNCS = 8
_MAGIC = b"HPCTOOLKIT"


def _header(fmt: bytes, sections: list[tuple[int, int]]) -> bytes:
    out = bytearray(_MAGIC + fmt + b"\x00\x00")
    for size, ptr in sections:
        out += struct.pack("<QQ", size, ptr)
    return bytes(out)


def write_meta(outdir: str) -> list[int]:
    """Returns the function-context ctx ids (children of the entry)."""
    buf = bytearray(b"\x00" * (0x10 + 16 * 8))  # header patched last

    # ---- strings (function names + kind names + entry pretty name)
    str_ptrs: dict[str, int] = {}

    def put_str(s: str) -> int:
        if s not in str_ptrs:
            str_ptrs[s] = len(buf)
            buf.extend(s.encode() + b"\x00")
        return str_ptrs[s]

    kind_ptrs = [put_str(k) for k in ("NODE", "RANK", "CORE", "THREAD")]
    p_pretty = put_str("main thread")
    fn_name_ptrs = [put_str(f"fn_{i}") for i in range(N_FUNCS)]

    # ---- IdNames section: u64 pp_names, u8 n_kinds; ptr array
    while len(buf) % 8:
        buf.append(0)
    pp_names = len(buf)
    for p in kind_ptrs:
        buf.extend(struct.pack("<Q", p))
    p_idnames = len(buf)
    buf.extend(struct.pack("<QB", pp_names, len(kind_ptrs)))

    # ---- Functions section: array of (p_name,) entries, sz_fn=16
    while len(buf) % 8:
        buf.append(0)
    p_fn_arr = len(buf)
    sz_fn = 16
    fn_offsets = []
    for p in fn_name_ptrs:
        fn_offsets.append(len(buf))
        buf.extend(struct.pack("<QQ", p, 0))
    p_functions = len(buf)
    buf.extend(struct.pack("<QIH", p_fn_arr, N_FUNCS, sz_fn))

    # ---- context tree: one entry context (ctx 1) whose children are
    # N_FUNCS function contexts (ctx 2..); each child record is
    # 32 bytes + 8*n_flex (n_flex=1: the FS pointer)
    while len(buf) % 8:
        buf.append(0)
    p_children = len(buf)
    child_ids = []
    for i in range(N_FUNCS):
        ctx_id = 2 + i
        child_ids.append(ctx_id)
        rec = struct.pack(
            "<QQI", 0, 0, ctx_id          # szChildren, pChildren, ctxId
        ) + bytes([
            1,                             # +20 flags: hasFunction
            0,
            0,                             # +22 lexical_type: function
            1,                             # +23 n_flex
        ]) + b"\x00" * 8                   # pad to +32
        rec += struct.pack("<Q", fn_offsets[i])  # flex[0]: FS*
        buf.extend(rec)
    sz_children = len(buf) - p_children

    # entry record: u64 szChildren, u64 pChildren, u32 ctxId, pad,
    # u64 pPretty at +24 → sz_entry = 32
    while len(buf) % 8:
        buf.append(0)
    p_entries = len(buf)
    buf.extend(struct.pack("<QQI", sz_children, p_children, 1))
    buf.extend(b"\x00" * 4)
    buf.extend(struct.pack("<Q", p_pretty))
    sz_entry = 32
    p_context = len(buf)
    buf.extend(struct.pack("<QHB", p_entries, 1, sz_entry))

    sections = [(0, 0)] * 8
    sections[1] = (16, p_idnames)
    sections[3] = (16, p_context)
    sections[7] = (16, p_functions)
    buf[: 0x10 + 16 * 8] = _header(b"meta", sections)
    with open(os.path.join(outdir, "meta.db"), "wb") as f:
        f.write(buf)
    return child_ids


def write_profiles(outdir: str, num_threads: int) -> None:
    buf = bytearray(b"\x00" * (0x10 + 16 * 2))
    tuple_ptrs = []
    for t in range(num_threads):
        while len(buf) % 8:
            buf.append(0)
        tuple_ptrs.append(len(buf))
        buf.extend(struct.pack("<H", 2) + b"\x00" * 6)
        # RANK (kind 1, logical), THREAD (kind 3, logical)
        buf.extend(struct.pack("<BxHIQ", 1, 0, t, t))
        buf.extend(struct.pack("<BxHIQ", 3, 0, 0, 0))
    while len(buf) % 8:
        buf.append(0)
    p_arr = len(buf)
    sz_profile = 0x28
    for p in tuple_ptrs:
        buf.extend(b"\x00" * 0x20 + struct.pack("<Q", p))
    p_infos = len(buf)
    buf.extend(struct.pack("<QIB", p_arr, num_threads, sz_profile))
    buf[: 0x10 + 16 * 2] = _header(b"prof", [(16, p_infos), (0, 0)])
    with open(os.path.join(outdir, "profile.db"), "wb") as f:
        f.write(buf)


def write_trace(
    outdir: str, num_threads: int, samples_per: int, ctx_ids: list[int]
) -> None:
    """Per-thread sample lines; seeded random context walk."""
    path = os.path.join(outdir, "trace.db")
    hdr_region = 0x10 + 16  # file header + 1 section pair
    cth_size = 0x20
    n = num_threads
    sz_trace = 24
    p_cth = hdr_region
    p_traces = p_cth + cth_size
    p_data = p_traces + n * sz_trace
    min_ts, max_ts = 1_000, 1_000 + samples_per * 10 + 10

    with open(path, "wb") as f:
        f.write(_header(b"trce", [(16, p_cth)]))
        f.write(struct.pack("<QIB", p_traces, n, sz_trace)
                + b"\x00" * 3 + struct.pack("<QQ", min_ts, max_ts))
        # per-thread data laid out back-to-back after the headers
        offs = []
        pos = p_data
        for _t in range(n):
            offs.append((pos, pos + samples_per * 12))
            pos += samples_per * 12
        for i, (s, e) in enumerate(offs):
            f.write(struct.pack("<IxxxxQQ", i, s, e))
        for t in range(n):
            rng = np.random.default_rng(0xACE + t)
            ts = (min_ts + 3 + np.arange(samples_per, dtype=np.uint64)
                  * np.uint64(10))
            # dwell: repeat each context ~4 samples before switching
            switches = rng.integers(0, len(ctx_ids), size=samples_per // 4 + 1)
            ctx = np.repeat(switches, 4)[:samples_per].astype(np.uint32)
            ctx = np.array(ctx_ids, dtype=np.uint32)[ctx]
            rec = np.zeros(samples_per,
                           dtype=np.dtype([("ts", "<u8"), ("ctx", "<u4")]))
            rec["ts"], rec["ctx"] = ts, ctx
            f.write(rec.tobytes())


def synthesize(outdir: str, num_threads: int, samples_per: int) -> None:
    os.makedirs(outdir, exist_ok=True)
    ctx_ids = write_meta(outdir)
    write_profiles(outdir, num_threads)
    write_trace(outdir, num_threads, samples_per, ctx_ids)


if __name__ == "__main__":
    outdir, n, per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    synthesize(outdir, n, per)
    print(f"{outdir}: {n} threads x {per} samples")
