"""Reproduce the round-2 whole-pass eval_scan TPU worker crash
(VERDICT r2 #6) and capture the actual error.

Round-2 observation: a SINGLE scanned dispatch covering a whole
gowalla-scale eval pass (392 batches × 256 users × 1.12M items)
reproducibly crashed the TPU worker ("kernel fault"); chunks of ≤8e9
score entries ran reliably.  The evaluator now derives its
per-dispatch budget from device memory_stats
(eval/evaluator.py::_scan_entry_budget); this script intentionally
exceeds it to pin the failure mode.

WARNING: run LAST in a TPU session — the crash can wedge the axon
tunnel for a long time.
"""

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_ITEMS = 1_120_000
B = 256
N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 392
D, K = 64, 20

rng = np.random.default_rng(0)
item_all = jnp.asarray(rng.normal(size=(N_ITEMS, D)).astype(np.float32))
users = jnp.asarray(rng.normal(size=(N_BATCHES, B, D)).astype(np.float32))

print(f"score entries per dispatch: {N_BATCHES * B * N_ITEMS:.2e}",
      flush=True)


@jax.jit
def whole_pass(users, item_all):
    def body(carry, u):
        scores = jnp.dot(u, item_all.T, preferred_element_type=jnp.float32)
        v, idx = jax.lax.top_k(scores, K)
        return carry, (v.sum(), idx.max())
    _, (vs, idxs) = jax.lax.scan(body, 0, users)
    return vs.sum(), idxs.max()


try:
    t0 = time.time()
    v, i = whole_pass(users, item_all)
    print(f"SURVIVED: {float(v):.3f} idx_max={int(i)} "
          f"[{time.time()-t0:.0f}s]", flush=True)
except Exception:
    traceback.print_exc()
    print("CRASH REPRODUCED — capture the error above", flush=True)
