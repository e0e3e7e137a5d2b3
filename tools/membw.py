"""Memory-bandwidth ceiling probe for the scaling-ladder analysis.

Measures achievable DRAM bandwidth (STREAM-copy-like: numpy array copy,
~2 bytes moved per byte copied) for P concurrent single-threaded
processes, each pinned to its own core.  On a single-socket box every
core shares one memory controller, so aggregate bandwidth saturates as P
grows — per-core bandwidth at P=16 is a fraction of P=1.  A multi-node
cluster does NOT share this substrate (each node brings its own memory
controllers), so an on-box N→4N *core* ladder understates N→4N *node*
scaling for any bandwidth-bound stage.  BASELINE.md cites this probe's
numbers next to the ladder.

Usage: python tools/membw.py [P ...]   (default: 1 2 4 8 16 32)
Prints one JSON line: {P: {"agg_gbps": x, "per_core_gbps": y}, ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ARR_MB = 256          # per-process working set, far beyond L3
REPS = 8              # copy passes per timing


def _worker(core: int) -> float:
    os.sched_setaffinity(0, {core})
    import numpy as np

    n = ARR_MB * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src)
    dst[:] = src  # warm pages
    t0 = time.perf_counter()
    for _ in range(REPS):
        dst[:] = src
    dt = time.perf_counter() - t0
    # read + write traffic per pass
    return 2 * REPS * n * 8 / dt / 1e9


def main() -> None:
    ps = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = {}
    for p in ps:
        procs = []
        for core in range(p):
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        "-c",
                        "import sys; sys.path.insert(0, %r); "
                        "from tools.membw import _worker; print(_worker(%d))"
                        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), core),
                    ],
                    stdout=subprocess.PIPE,
                    text=True,
                    env=dict(os.environ, OMP_NUM_THREADS="1"),
                )
            )
        per = [float(pr.communicate()[0].strip()) for pr in procs]
        out[p] = {
            "agg_gbps": round(sum(per), 1),
            "per_core_gbps": round(sum(per) / p, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
