"""Profile one streaming-SpMM chain on TPU and print top device ops.

Usage: python scripts/diag/trace_top_ops.py [n e d bm ec prec iters]

Wraps the timed chain in jax.profiler.trace and aggregates XLA op
durations from the .trace.json.gz so the gather / kernel / copy split
is visible without a tensorboard UI.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
e = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
bm = int(sys.argv[4]) if len(sys.argv) > 4 else None
ec = int(sys.argv[5]) if len(sys.argv) > 5 else None
prec = sys.argv[6] if len(sys.argv) > 6 else "packed"
iters = int(sys.argv[7]) if len(sys.argv) > 7 else 10

import jax
import jax.numpy as jnp
from recbole_gnn_tpu.ops.pallas_spmm import (
    build_pallas_meta, pad_edges, pallas_spmm)

rng = np.random.default_rng(0)
half = e // 2
u = rng.integers(0, n // 2, half)
i = rng.integers(n // 2, n, half)
src = np.concatenate([u, i])
dst = np.concatenate([i, u])
deg = np.bincount(dst, minlength=n).astype(np.float64)
dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
w = (dinv[src] * dinv[dst]).astype(np.float32)
sp_, dp_, wp_ = pad_edges(src, dst, w, n, ec=ec)
meta = build_pallas_meta(dp_, n, bm=bm, ec=ec)
print(f"n={n} e={e} d={d} bm={meta.bm} ec={meta.ec} {prec} "
      f"n_seg={meta.n_seg} max_blk={meta.max_blk}", flush=True)
spj, dpj, wpj = jnp.asarray(sp_), jnp.asarray(dp_), jnp.asarray(wp_)
x0 = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)


@jax.jit
def chain(x):
    def body(xc, _):
        return pallas_spmm(spj, dpj, wpj, xc, meta,
                           precision=prec)[:n], None
    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out


import time
t0 = time.perf_counter()
out = chain(x0)
float(out[0, 0])
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = chain(x0)
float(out[0, 0])
per = (time.perf_counter() - t0) / iters
print(f"{per*1e3:.3f} ms/spmm ({e/per/1e9:.2f} Gedge/s)", flush=True)

trace_dir = "/tmp/spmm_trace"
with jax.profiler.trace(trace_dir):
    out = chain(x0)
    float(out[0, 0])

files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                         recursive=True))
if not files:
    print("no trace file found under", trace_dir)
    sys.exit(0)
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)

# aggregate complete events on TPU device tracks
pid_names = {ev.get("pid"): ev.get("args", {}).get("name", "")
             for ev in trace["traceEvents"]
             if ev.get("ph") == "M" and ev.get("name") == "process_name"}
agg = defaultdict(float)
cnt = defaultdict(int)
for ev in trace["traceEvents"]:
    if ev.get("ph") != "X":
        continue
    pname = pid_names.get(ev.get("pid"), "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    name = ev.get("name", "?")
    agg[name] += ev.get("dur", 0) / 1e3   # ms
    cnt[name] += 1
total = sum(agg.values())
print(f"\ndevice total {total:.1f} ms over {iters} iters "
      f"({total/iters:.2f} ms/iter attributed)")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
    print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:90]}")
