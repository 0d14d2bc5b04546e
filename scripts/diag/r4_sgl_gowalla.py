"""SGL at the gowalla north-star shape (r4): prove the augmented
contrastive family rides the fast sparse path at web scale.

Uses the REAL pipeline (gowalla_synth dataset + SGL model): measures
  1. epoch_start view rebuild (2 per-epoch augmented views, static-nnz
     renormalization + epoch-reweighted ELL slot regather)
  2. the jitted train step (3 graph propagations fwd+bwd — main +
     2 views — + BPR + InfoNCE + Adam), scanned, carry-dependent
  3. XLA buffer-assignment memory of the compiled step

B=4096: the ssl denominator is (B, n_users)+(B, n_items) matmuls, so
the B=65536 trick used for LightGCN does not apply wholesale here.
Run scripts/diag/gowalla_scale_run.py once first (generates the
synthetic dataset under /tmp/synth_data).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from functools import partial

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.config import Config
from recbole_gnn_tpu.models import get_model
from recbole_gnn_tpu.quick_start import create_dataset, data_preparation
from recbole_gnn_tpu.train.optim import make_optimizer

B, ITERS = int(next((a[2:] for a in sys.argv[1:] if a.startswith("b=")), 4096)), 4

if "tight" in sys.argv[1:]:
    # bound the two big transient classes: per-bucket gathered message
    # blocks (T(8,128) lane padding doubles their real footprint at
    # D=64 f32) and the chunked-InfoNCE logits blocks
    import recbole_gnn_tpu.ops.ell_spmm as _e
    import recbole_gnn_tpu.models.losses as _l
    _e.BUCKET_BYTES_BUDGET = 1 << 30
    _l._NCE_CHUNK_ENTRIES = 1 << 27
    print("(tight: 1 GiB bucket budget, 128M-entry NCE chunks)",
          flush=True)

cfg_extra = {}
if "bf16" in sys.argv[1:]:
    cfg_extra["activation_dtype"] = "bfloat16"
    print("(bf16 activations)", flush=True)
cfg = Config(model="SGL", dataset="gowalla_synth", config_dict={
    "data_path": "/tmp/synth_data", "train_batch_size": B,
    "enable_sparse": True, "state": "ERROR",
    "load_col": {"inter": ["user_id", "item_id", "timestamp"]},
    **cfg_extra})
t0 = time.time()
ds = create_dataset(cfg)
(tl, tr_ds), _, _ = data_preparation(cfg, ds)
print(f"dataset+loaders [{time.time()-t0:.0f}s]", flush=True)

t0 = time.time()
model = get_model("SGL")(cfg, tr_ds)
print(f"model+graph consts (ELL fwd+rev, epos) [{time.time()-t0:.0f}s] "
      f"E={model.consts['graph'].n_edges}", flush=True)

key = jax.random.PRNGKey(0)
params = model.init_params(key)
optimizer = make_optimizer("adam", float(cfg["learning_rate"] or 1e-3))
opt_state = optimizer.init(params)

# 1. epoch_start view rebuild (compile + steady)
t0 = time.time()
extras = model.epoch_start(0, params, model.consts, None, key)
jax.tree_util.tree_map(lambda a: a.block_until_ready(), extras)
float(extras["view1"].ravel()[0])
print(f"  [epoch_start] compile+1st {time.time()-t0:.0f}s", flush=True)
best = None
for i in range(3):
    t0 = time.perf_counter()
    extras = model.epoch_start(0, params, model.consts,
                               extras, jax.random.PRNGKey(i))
    float(extras["view1"].ravel()[0])
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"epoch_start view rebuild: {best*1e3:.0f} ms/epoch", flush=True)

# 2. train step (batch from the real loader, padded static shapes)
batch_np = next(iter(tl))
batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
consts = model.consts


@partial(jax.jit, donate_argnums=(0, 1))
def run(params, opt_state, extras, batch):
    def step(carry, _):
        params, opt_state = carry
        def loss_fn(p):
            l, _ = model.calculate_loss(p, consts, extras, batch, key)
            return l
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return (params, opt_state), loss
    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), None, length=ITERS)
    return params, opt_state, losses[-1]


if "mem" in sys.argv[1:]:
    ma = run.lower(params, opt_state, extras, batch).compile() \
        .memory_analysis()
    gib = 2.0 ** 30
    print(f"step HBM: args {ma.argument_size_in_bytes/gib:.2f} + out "
          f"{ma.output_size_in_bytes/gib:.2f} + temp "
          f"{ma.temp_size_in_bytes/gib:.2f} GiB", flush=True)

t0 = time.time()
params, opt_state, loss = run(params, opt_state, extras, batch)
float(loss)
print(f"  [train step] compile+1st {time.time()-t0:.0f}s "
      f"loss={float(loss):.3f}", flush=True)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    params, opt_state, loss = run(params, opt_state, extras, batch)
    float(loss)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
per = best / ITERS
n_steps = tr_ds.inter_num // B
print(f"train step: {per*1e3:.0f} ms  →  steady epoch ({n_steps} steps)"
      f" ≈ {per*n_steps:.0f} s", flush=True)

