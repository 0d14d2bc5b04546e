"""Evaluator — full-sort and uniN top-k evaluation.

Reimplements the [recbole] eval collector + metric pipeline the
reference relies on (SURVEY.md §3.3): general models propagate the
full graph ONCE per evaluation and score chunks of users against the
whole catalog with train-history −inf masking; sequential models score
each session batch; uniN mode ranks within sampled candidate lists.

Everything on-device and jitted; metric contributions are accumulated
as weighted sums so padded eval rows (weight 0) vanish.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from recbole_gnn_tpu.eval.metrics import topk_metrics
from recbole_gnn_tpu.ops.topk import NEG_INF, masked_topk
from recbole_gnn_tpu.utils.enums import ModelType


class Evaluator:

    def __init__(self, config, model, mesh=None):
        self.config = config
        self.model = model
        self.topk = tuple(config["topk"])
        self.max_k = max(self.topk)
        self.metrics = tuple(m.lower() for m in (config["metrics"] or
                             ["Recall", "MRR", "NDCG", "Hit", "Precision"]))
        self.is_sequential = model.model_type == ModelType.SEQUENTIAL
        self.n_items = model.n_items
        self._propagate_jit = None
        self._eval_rng = jax.random.PRNGKey(int(config.get("seed", 2020)) + 9999)
        # distributed full-sort: item table row-sharded over the mesh's
        # tp axis, per-shard top-k + tiny candidate merge (EP-analog —
        # SURVEY.md §2.7); engaged when the trainer passes its mesh
        self.mesh = mesh
        self._dist_full_sort = None

    # -- jitted pieces --------------------------------------------------

    def _metric_sums(self, topk_idx, pos_items, pos_len, weight):
        vals = topk_metrics(topk_idx, pos_items, pos_len, self.topk)
        sums = {k: jnp.sum(v * weight) for k, v in vals.items()}
        sums["__weight__"] = jnp.sum(weight)
        return sums

    @partial(jax.jit, static_argnums=0)
    def _nonfactorized_full_sort_batch(self, params, extras, batch):
        users = batch["user_id"]
        scores = self.model.score_users_vs_all(params, users)
        B = scores.shape[0]
        rows = jnp.arange(B)[:, None]
        hist = batch["history_items"]
        mask = jnp.zeros(scores.shape, dtype=bool).at[rows, hist].set(True)
        mask = mask.at[:, 0].set(True)
        scores = jnp.where(mask, NEG_INF, scores)
        _, idx = masked_topk(scores, self.max_k)
        return self._metric_sums(idx, batch["pos_items"], batch["pos_len"],
                                 batch["weight"])

    @partial(jax.jit, static_argnums=0)
    def _nonfactorized_candidates_batch(self, params, extras, batch):
        users = batch["user_id"]
        cand = batch["candidates"]
        scores = self.model.score_users_vs_all(params, users)
        cscores = jnp.take_along_axis(scores, cand, axis=1)
        valid = jnp.arange(cand.shape[1])[None, :] < batch["cand_len"][:, None]
        cscores = jnp.where(valid, cscores, NEG_INF)
        k = min(self.max_k, cand.shape[1])
        _, pos_idx = jax.lax.top_k(cscores, k)
        topk_items = jnp.take_along_axis(cand, pos_idx, axis=1)
        if k < self.max_k:
            topk_items = jnp.pad(topk_items, ((0, 0), (0, self.max_k - k)))
        return self._metric_sums(topk_items, batch["pos_items"],
                                 batch["pos_len"], batch["weight"])

    def _full_sort_sums(self, user_all, item_all, batch):
        users = batch["user_id"]
        u_e = user_all[users]
        scores = jnp.dot(u_e, item_all.T, preferred_element_type=jnp.float32)
        B = scores.shape[0]
        rows = jnp.arange(B)[:, None]
        hist = batch["history_items"]
        mask = jnp.zeros(scores.shape, dtype=bool).at[rows, hist].set(True)
        mask = mask.at[:, 0].set(True)  # PAD item
        scores = jnp.where(mask, NEG_INF, scores)
        _, idx = masked_topk(scores, self.max_k)
        return self._metric_sums(idx, batch["pos_items"], batch["pos_len"],
                                 batch["weight"])

    @partial(jax.jit, static_argnums=0)
    def _general_full_sort_batch(self, user_all, item_all, batch):
        return self._full_sort_sums(user_all, item_all, batch)

    @partial(jax.jit, static_argnums=0)
    def _general_full_sort_scan(self, user_all, item_all, stacked):
        """Whole eval pass in ONE device dispatch (``eval_scan: true``):
        a lax.scan over the stacked (n_batches, B, ...) eval arrays.
        Per-batch dispatch latency (~0.2-0.4 s over a remote tunnel)
        otherwise dominates large-catalog eval; compile happens once
        per eval shape and is reused every eval_step."""
        def body(carry, batch):
            return carry, self._full_sort_sums(user_all, item_all, batch)
        _, ys = jax.lax.scan(body, 0, stacked)
        return {k: v.sum(0) for k, v in ys.items()}

    @partial(jax.jit, static_argnums=0)
    def _general_candidates_batch(self, user_all, item_all, batch):
        users = batch["user_id"]
        cand = batch["candidates"]
        u_e = user_all[users]
        c_e = item_all[cand]
        scores = jnp.einsum("bd,bcd->bc", u_e, c_e)
        valid = jnp.arange(cand.shape[1])[None, :] < batch["cand_len"][:, None]
        scores = jnp.where(valid, scores, NEG_INF)
        k = min(self.max_k, cand.shape[1])
        _, pos_idx = jax.lax.top_k(scores, k)
        topk_items = jnp.take_along_axis(cand, pos_idx, axis=1)
        if k < self.max_k:  # pad with PAD item (never relevant)
            topk_items = jnp.pad(topk_items, ((0, 0), (0, self.max_k - k)))
        return self._metric_sums(topk_items, batch["pos_items"],
                                 batch["pos_len"], batch["weight"])

    def _sequential_full_sort_sums(self, params, consts, extras, batch, rng):
        scores = self.model.full_scores(
            params, consts, extras, batch, rng, False)
        scores = scores.at[:, 0].set(NEG_INF)
        _, idx = masked_topk(scores, self.max_k)
        return self._metric_sums(idx, batch["pos_items"], batch["pos_len"],
                                 batch["weight"])

    @partial(jax.jit, static_argnums=0)
    def _sequential_full_sort_batch(self, params, consts, extras, batch, rng):
        return self._sequential_full_sort_sums(params, consts, extras, batch,
                                               rng)

    @partial(jax.jit, static_argnums=0)
    def _sequential_full_sort_scan(self, params, consts, extras, stacked,
                                   rng):
        """Chunk of the sequential eval pass in ONE dispatch (VERDICT r3
        weak #4: the per-batch loop pays ~0.3 s of tunnel latency per
        dispatch — several hundred batches at diginetica scale made
        dispatch, not compute, the eval cost).  Same `eval_scan`
        config/budget as the general path."""
        def body(carry, batch):
            return carry, self._sequential_full_sort_sums(
                params, consts, extras, batch, rng)
        _, ys = jax.lax.scan(body, 0, stacked)
        return {k: v.sum(0) for k, v in ys.items()}

    @partial(jax.jit, static_argnums=0)
    def _sequential_candidates_batch(self, params, consts, extras, batch, rng):
        scores = self.model.full_scores(
            params, consts, extras, batch, rng, False)
        cand = batch["candidates"]
        cscores = jnp.take_along_axis(scores, cand, axis=1)
        valid = jnp.arange(cand.shape[1])[None, :] < batch["cand_len"][:, None]
        cscores = jnp.where(valid, cscores, NEG_INF)
        k = min(self.max_k, cand.shape[1])
        _, pos_idx = jax.lax.top_k(cscores, k)
        topk_items = jnp.take_along_axis(cand, pos_idx, axis=1)
        if k < self.max_k:
            topk_items = jnp.pad(topk_items, ((0, 0), (0, self.max_k - k)))
        return self._metric_sums(topk_items, batch["pos_items"],
                                 batch["pos_len"], batch["weight"])

    def _scan_entry_budget(self) -> int:
        """Per-dispatch (batch · n_items) score-entry budget for the
        auto-chunked eval scan.

        Failure mode this bounds (round 2, gowalla scale): a SINGLE
        scanned dispatch covering the whole eval pass (392 batches ×
        256 users × 1.12M items) reproducibly crashed the TPU worker
        with a kernel fault — the XLA program's cumulative transient
        allocation (per-iteration (B, n_items) scores + top-k scratch,
        which buffer assignment does not fully reuse across scan
        iterations at that program size) exceeded device memory.
        Chunks of ≤ 8e9 entries (K=32 there) ran reliably.

        Budget: ¼ of the device's free HBM divided by 4 B/entry ×2
        (scores + top-k scratch), i.e. entries ≤ free_bytes / 32 —
        ≈ 8e9 entries on an idle 16 GB v5e minus the propagated
        embeddings, converging to the hardware-verified constant;
        falls back to that constant where memory_stats is unavailable
        (CPU tests, older runtimes).

        Round-4 re-test (scripts/diag/r3_evalscan_repro.py, VERDICT
        r3 #6): the whole 392-batch pass (1.12e11 entries, one
        dispatch) now SURVIVES in isolation on the current runtime —
        with the sort-based lax.top_k it runs 235 s, with the r4
        exact-ApproxTopK masked_topk 44 s incl. compile.  The r2
        crash is no longer reproducible without the full training
        context (graph consts + params + opt state resident), so the
        budget is kept as a cheap defensive bound for exactly that
        resident-memory case, not as a hard correctness requirement."""
        try:
            stats = jax.devices()[0].memory_stats()
            free = (stats["bytes_limit"] - stats["bytes_in_use"])
            if free > 0:
                return max(1_000_000_000, int(free) // 32)
        except Exception:
            pass
        return 8_000_000_000   # hardware-verified v5e fallback

    # -- distributed full-sort (EP-analog) -------------------------------

    def _use_dist_eval(self, mode: str) -> bool:
        return (mode == "full" and self.mesh is not None
                and "tp" in self.mesh.axis_names
                and self.mesh.shape["tp"] > 1)

    def _get_dist_full_sort(self):
        """Jitted batch scorer routing through the item-sharded
        distributed top-k (parallel/topk.py): the (B, n_items) score
        matrix never exists on one chip — each shard scores its rows of
        the catalog and only the (tp, B, k) candidate sets cross ICI.
        Matches the reference full-sort convention (lightgcn.py:123-133
        + [recbole] history −inf masking)."""
        if self._dist_full_sort is not None:
            return self._dist_full_sort
        from recbole_gnn_tpu.parallel.topk import distributed_full_sort_topk
        mesh = self.mesh
        n_shards = mesh.shape["tp"]
        n_items_pad = -(-self.n_items // n_shards) * n_shards
        n_items = self.n_items
        max_k = self.max_k
        metric_sums = self._metric_sums

        @jax.jit
        def fn(user_all, item_all, batch):
            users = batch["user_id"]
            u_e = user_all[users]
            if n_items_pad != n_items:
                item_all = jnp.pad(
                    item_all, ((0, n_items_pad - n_items), (0, 0)))
            B = users.shape[0]
            # appended 0 column guarantees the PAD item is always in
            # the exclusion list; masking happens per shard inside the
            # shard_map (no (B, n_items) mask on any one chip)
            hist = jnp.concatenate(
                [batch["history_items"],
                 jnp.zeros((B, 1), batch["history_items"].dtype)], axis=1)
            _, idx = distributed_full_sort_topk(
                u_e, item_all, hist, max_k, mesh,
                n_valid_items=n_items)
            return metric_sums(idx, batch["pos_items"],
                               batch["pos_len"], batch["weight"])

        self._dist_full_sort = fn
        return fn

    # -- public API -----------------------------------------------------

    def _iter_scan_chunks(self, batches):
        """Stacked (k, B, …) chunks per the `eval_scan` config: True →
        auto-size from the HBM entry budget; int K → K batches per
        dispatch.  The last chunk pads with weight-0 copies of batch 0
        so one compiled shape serves the whole pass."""
        cfg_scan = self.config["eval_scan"]
        if isinstance(cfg_scan, bool):
            B = batches[0]["weight"].shape[0]   # present on every loader
            k = int(max(1, self._scan_entry_budget()
                        // max(1, B * self.n_items)))
            # sequential batches also carry the per-session graph
            # arrays (x / alias / edges / eop mailboxes …), which the
            # score-entry budget does not see — additionally bound the
            # stacked chunk's own INPUT bytes (k × one batch's arrays)
            # to 1 GiB so long-L session datasets with small catalogs
            # cannot stack multi-GiB scan inputs (r4 review finding)
            batch_bytes = sum(np.asarray(v).nbytes
                              for v in batches[0].values())
            k = min(k, int(max(1, (1 << 30) // max(1, batch_bytes))))
        else:
            k = int(cfg_scan)
        k = max(1, min(k, len(batches)))
        if len(batches) % k:
            dead = {kk: (np.zeros_like(v) if kk == "weight" else v)
                    for kk, v in batches[0].items()}
            batches = batches + [dead] * (k - len(batches) % k)
        for lo in range(0, len(batches), k):
            yield {kk: np.stack([b[kk] for b in batches[lo:lo + k]])
                   for kk in batches[0]}

    def evaluate(self, params, extras, loader, mode: str = "full") -> dict:
        """Run a full evaluation pass; returns {metric@k: float}."""
        totals: dict[str, float] = {}
        if self.is_sequential:
            consts = self.model.consts
            if mode == "full" and bool(self.config["eval_scan"]):
                batches = list(loader)
                if not batches:
                    return {}
                for stacked in self._iter_scan_chunks(batches):
                    sums = self._sequential_full_sort_scan(
                        params, consts, extras, stacked, self._eval_rng)
                    self._accumulate(totals, sums)
            else:
                for batch in loader:
                    fn = (self._sequential_full_sort_batch if mode == "full"
                          else self._sequential_candidates_batch)
                    sums = fn(params, consts, extras, batch, self._eval_rng)
                    self._accumulate(totals, sums)
        elif not self.model.factorized_eval:
            for batch in loader:
                fn = (self._nonfactorized_full_sort_batch if mode == "full"
                      else self._nonfactorized_candidates_batch)
                sums = fn(params, extras, batch)
                self._accumulate(totals, sums)
        else:
            if self._propagate_jit is None:
                # consts passed as a jit argument — closure capture would
                # bake the (possibly 100MB+) adjacency into the HLO
                self._propagate_jit = jax.jit(
                    lambda p, c, e: self.model.propagate(p, c, e))
            user_all, item_all = self._propagate_jit(
                params, self.model.consts, extras)
            if self._use_dist_eval(mode):
                dist_fn = self._get_dist_full_sort()
                for batch in loader:
                    sums = dist_fn(user_all, item_all, batch)
                    self._accumulate(totals, sums)
            elif mode == "full" and bool(self.config["eval_scan"]):
                # eval_scan: true → whole pass in one dispatch;
                # eval_scan: K (int > 1) → chunks of K batches per
                # dispatch (one compile, reused: the last chunk is
                # padded with weight-0 copies of batch 0)
                batches = list(loader)
                if not batches:
                    # degrade like the per-batch loop would: no sums →
                    # empty result (ADVICE r2: batches[0] IndexError)
                    return {}
                for stacked in self._iter_scan_chunks(batches):
                    sums = self._general_full_sort_scan(
                        user_all, item_all, stacked)
                    self._accumulate(totals, sums)
            else:
                for batch in loader:
                    fn = (self._general_full_sort_batch if mode == "full"
                          else self._general_candidates_batch)
                    sums = fn(user_all, item_all, batch)
                    self._accumulate(totals, sums)
        w = max(float(totals.pop("__weight__", 0.0)), 1e-12)
        out = {}
        for name in self.metrics:
            for k in self.topk:
                key = f"{name}@{k}"
                if key in totals:
                    out[key] = float(totals[key]) / w
        return out

    @staticmethod
    def _accumulate(totals, sums):
        # device-lazy adds: a float() here would force a device→host
        # sync EVERY batch — over the remote tunnel that round-trip
        # (~0.3-0.4 s) dominated large-catalog eval (165 s for 391
        # batches at gowalla scale).  Async dispatch pipelines the
        # whole pass; the single sync happens in evaluate()'s final
        # float() conversions.
        for k, v in sums.items():
            prev = totals.get(k)
            totals[k] = v if prev is None else prev + v
