"""Case-study / serving helpers: score chosen users against the full
catalog on a trained model.

Parity surface: [recbole] ``utils/case_study.py`` (``full_sort_scores``
/ ``full_sort_topk``), which the reference inherits for inspecting
individual recommendations — the same API a production serving path
uses (propagate once, score many user batches).

TPU-first shape: one jitted propagation produces the factorized
(user_all, item_all) tables, then scoring any user set is a single
(B, d) x (d, n_items) MXU matmul with history/PAD −inf masking —
identical to the evaluator's full-sort convention
(reference lightgcn.py:123-133).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from recbole_gnn_tpu.ops.topk import NEG_INF
from recbole_gnn_tpu.utils.enums import ModelType


def _history_mask_rows(uid_series: np.ndarray, history: dict | None,
                       n_items: int) -> np.ndarray | None:
    """(B, max_hist) padded history item ids (PAD 0) for the given
    users; None when no history was supplied."""
    if history is None:
        return None
    rows = [np.asarray(history.get(int(u), ()), dtype=np.int64)
            for u in uid_series]
    width = max((len(r) for r in rows), default=0)
    if width == 0:
        return None
    out = np.zeros((len(rows), width), dtype=np.int64)
    for b, r in enumerate(rows):
        out[b, :len(r)] = r
    return out


def full_sort_scores(uid_series, model, params, extras,
                     history: dict | None = None) -> jax.Array:
    """(B, n_items) f32 scores of each given user vs the whole catalog.

    ``uid_series``: internal user ids (ints / array).  ``history``:
    optional {uid: np.ndarray of item ids} (e.g.
    ``train_dataset.history_matrix()``) — those items and the PAD item
    are masked to −inf, matching evaluation/serving semantics.  For
    sequential models score sessions via ``model.full_scores`` instead
    (a user id alone does not identify a session).
    """
    if model.model_type == ModelType.SEQUENTIAL:
        raise ValueError(
            "case_study full-sort scoring is defined for general/social "
            "models; sequential models score sessions via full_scores")
    uid_series = np.atleast_1d(np.asarray(uid_series, dtype=np.int64))
    uids = jnp.asarray(uid_series)
    if model.factorized_eval:
        user_all, item_all = jax.jit(model.propagate)(
            params, model.consts, extras)
        scores = jnp.dot(user_all[uids], item_all.T,
                         preferred_element_type=jnp.float32)
    else:
        scores = model.score_users_vs_all(params, uids)
    scores = scores.at[:, 0].set(NEG_INF)          # PAD item
    hist = _history_mask_rows(uid_series, history, scores.shape[1])
    if hist is not None:
        rows = jnp.arange(scores.shape[0])[:, None]
        mask = jnp.zeros(scores.shape, bool).at[rows, jnp.asarray(hist)
                                                ].set(True)
        # PAD-padded history rows only ever re-mask column 0
        scores = jnp.where(mask, NEG_INF, scores)
    return scores


def full_sort_topk(uid_series, model, params, extras, k: int,
                   history: dict | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """Top-``k`` (scores, item ids) per user — [recbole]
    ``full_sort_topk`` parity."""
    scores = full_sort_scores(uid_series, model, params, extras, history)
    return jax.lax.top_k(scores, k)


def topk_items_by_token(user_tokens, model, params, extras, dataset,
                        k: int, mask_history: bool = True
                        ) -> dict[str, list[str]]:
    """External-token convenience: {user token: [item tokens]} top-k.

    ``dataset`` supplies the token vocabularies
    (``field2token_id`` / ``field2id_token``) and, when
    ``mask_history``, the interactions to exclude."""
    t2i = dataset.field2token_id[dataset.uid_field]
    uid_series = np.asarray([t2i[str(t)] for t in user_tokens],
                            dtype=np.int64)
    history = dataset.history_matrix() if mask_history else None
    _, idx = full_sort_topk(uid_series, model, params, extras, k, history)
    idx = np.asarray(idx)
    i2t = dataset.field2id_token[dataset.iid_field]
    return {str(tok): [str(i2t[j]) for j in row]
            for tok, row in zip(user_tokens, idx)}
