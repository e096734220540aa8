"""e44: op-level device-time profile of the spectral engine at N=2000.

Profiles one warm gr_sum dispatch in the dw-family mode (bench real-axis
grid) and one in f32 mode (shifted grid), then prints per-op-name SELF
time (event duration minus directly-contained children -- the round-3
lesson: the outer scan `while` row is INCLUSIVE of its body, so summing
raw rows double-counts).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e44_spectral_profile.py
"""

import glob
import gzip
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def parse_trace(logdir, top=24):
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        log(f"no trace under {logdir}")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = []
    device_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                device_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids \
                and ev.get("dur", 0) > 0:
            events.append((float(ev["ts"]), float(ev["dur"]),
                           ev.get("name", "?")))
    if not events:
        pids = {str(e.get("pid")) for e in data.get("traceEvents", [])}
        log(f"no device events found; pids seen: {sorted(pids)[:10]}")
        return
    # self time: subtract directly-contained children (stack sweep)
    events.sort(key=lambda e: (e[0], -e[1]))
    self_time = {}
    stack = []
    for ts, dur, name in events:
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            p = stack[-1]
            self_time[p[2]] = self_time.get(p[2], 0.0) - dur
        self_time[name] = self_time.get(name, 0.0) + dur
        stack.append((ts, dur, name))
    total = sum(v for v in self_time.values() if v > 0)
    log(f"total device self-time {total / 1e3:.1f} ms over "
        f"{len(events)} events")
    for name, t in sorted(self_time.items(), key=lambda kv: -kv[1])[:top]:
        if t <= 0:
            continue
        print(f"  {t / 1e3:9.2f} ms  {100 * t / total:5.1f}%  {name[:90]}",
              flush=True)


def profile_one(tag, eng, E, w):
    import time

    from gaunegf_tpu.utils.logging import profile_trace

    out = eng.gr_sum(E, w)                # compile + warm
    assert np.isfinite(out).all()
    t0 = time.time()
    eng.gr_sum(E, w)
    wall = time.time() - t0
    logdir = f"/tmp/e44_trace_{tag}"
    with profile_trace(logdir):
        eng.gr_sum(E, w)
    mode = eng._spectral_runner()._mode(E)
    print(f"RESULT {tag}: mode={mode} wall={wall:.2f}s "
          f"({len(E) / wall:.1f} pts/s)", flush=True)
    parse_trace(logdir)


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    N, n_E = 2000, 128
    H, S, g = tb_system(N)
    w = np.ones(n_E)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=16, solver="spectral"))

    log("profiling dw-family mode (real-axis bench grid)")
    profile_one("dwl", eng, np.linspace(-2.0, 2.0, n_E), w)
    log("profiling f32 mode (shifted grid, dist >= 0.01)")
    profile_one("f32", eng, np.linspace(-2.0, 2.0, n_E) + 0.01j, w)


if __name__ == "__main__":
    main()
