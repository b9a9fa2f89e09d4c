"""One-line machine-phase probe: memory write bandwidth + scalar FLOP rate.

The documented degraded co-tenancy phases on this box show up as
memory-bandwidth collapse (first-touch fill of a 40 MB numpy array
measured at ~7 MB/s during one) long before CPU-bound anchors notice.
Print both, plus the pure-python loop rate, so a bench run can be
gated on a quiet phase mechanically.

Usage: python tools/phase_probe.py   ->  {"fill_mbps": ..., "flops_m": ..., "py_loops_m": ...}
Healthy: fill_mbps > 2000, flops_m > 500.
"""

import json
import time

import numpy as np


def main() -> None:
    b = np.empty(5_000_000)
    t0 = time.time()
    b[:] = 1.0
    fill = 40 / max(time.time() - t0, 1e-9)

    a = np.random.rand(2_000_000)
    out = np.empty_like(a)
    t0 = time.time()
    for _ in range(5):
        np.multiply(a, a, out=out)
    flops = 10 / max(time.time() - t0, 1e-9)

    t0 = time.time()
    s = 0
    for i in range(2_000_000):
        s += i
    py = 2 / max(time.time() - t0, 1e-9)

    print(
        json.dumps(
            {
                "fill_mbps": round(fill, 1),
                "flops_m": round(flops, 1),
                "py_loops_m": round(py, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
