"""Pure-CPU multiprocessing microbench: measures THIS WINDOW's host-CPU
grant (steal ceiling) so Spark scaling readings can be normalized.

Each proc runs an identical fixed CPU burn (zlib compress of a 1 MiB
pseudo-random buffer, N iterations); perfect scaling keeps wall time flat
as procs grow. Prints per-proc-count wall (min-of-R) and the per-proc
efficiency vs the 1-proc wall. No Spark involved — this is the hardware/
hypervisor ceiling any engine shares (CLAUDE.md invariant 6).

Usage: python BENCH/cpu_ceiling.py [procs...]   (default: 1 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
import zlib

ITERS = 60
BUF = bytes((i * 2654435761) % 256 for i in range(1 << 20))


def _burn(_):
    acc = 0
    for _i in range(ITERS):
        acc ^= len(zlib.compress(BUF, 6))
    return acc


def wall(nproc: int, repeats: int = 3) -> float:
    best = None
    for _ in range(repeats):
        with mp.Pool(nproc) as pool:
            t0 = time.monotonic()
            pool.map(_burn, range(nproc))
            dt = time.monotonic() - t0
        if best is None or dt < best:
            best = dt
    return round(best, 3)


def main() -> None:
    procs = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    walls = {p: wall(p) for p in procs}
    base = walls.get(1, walls[min(walls)])
    out = {
        "walls": walls,
        "per_proc_efficiency": {p: round(base / w, 3) for p, w in walls.items()},
        "iters": ITERS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
