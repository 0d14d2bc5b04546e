"""Abstract recommenders — the model contract.

Equivalent of the reference's abstract_recommender.py:7-30 plus the
[recbole] AbstractRecommender contract (calculate_loss / predict /
full_sort_predict + other_parameter checkpointing — here ``extras``).

Functional contract (TPU-first):
  * a model *object* holds only static hyperparameters;
  * graph constants live in ``self.consts`` (a pytree of device arrays)
    and are passed explicitly through jit boundaries;
  * mutable non-parameter state (NCL centroids, HMLET temperature,
    SGL/SEPT augmented edge weights, …) lives in ``extras`` — the
    analog of the reference's ``other_parameter_name`` state, threaded
    through the train step and checkpointed;
  * ``calculate_loss`` is a pure function: (params, consts, extras,
    batch, rng) → (loss, aux-dict).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from recbole_gnn_tpu.utils.enums import ModelType, InputType

Params = Any   # nested dict pytree of jnp arrays
Consts = Any
Extras = Any
Batch = Any


class BaseRecommender:
    model_type: ModelType = ModelType.GENERAL
    input_type: InputType = InputType.PAIRWISE
    # False for models whose scores are not a user·item factorization
    # (e.g. NeuMF's MLP head) — eval then calls score_users_vs_all
    factorized_eval: bool = True

    def __init__(self, config, dataset):
        self.config = config
        self.n_users = dataset.n_users
        self.n_items = dataset.n_items
        self.consts: dict = {}

    # -- state ---------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Params:
        raise NotImplementedError

    def init_extras(self, rng: jax.Array) -> Extras:
        return {}

    # -- pure compute ---------------------------------------------------

    def calculate_loss(self, params: Params, consts: Consts, extras: Extras,
                       batch: Batch, rng: jax.Array, mode: int = 0
                       ) -> tuple[jax.Array, dict]:
        """Pure loss.  ``mode`` is a *static* int selecting warm-up
        variants (see Trainer._loss_mode); most models ignore it."""
        raise NotImplementedError

    def loss_mode(self, epoch: int) -> int:
        """Static loss variant for this epoch (default 0)."""
        return 0

    # -- trainer hooks (host-side, between epochs) -----------------------

    def epoch_start(self, epoch: int, params: Params, consts: Consts,
                    extras: Extras, rng: jax.Array) -> Extras:
        """Per-epoch state refresh (NCL e-step, SGL re-augmentation,
        SEPT subgraph rebuild, HMLET temperature decay…).  Default: no-op."""
        return extras


class GeneralGraphRecommender(BaseRecommender):
    """General recommenders over the normalized U-I bipartite graph
    (reference: abstract_recommender.py:7-20).  The symmetric-normalized
    adjacency is built once by the dataset and stored in consts."""

    model_type = ModelType.GENERAL
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.consts["graph"] = dataset.get_norm_adj_graph()

    def propagate(self, params: Params, consts: Consts, extras: Extras
                  ) -> tuple[jax.Array, jax.Array]:
        """Full-graph forward → (user_all_emb, item_all_emb).  Used by
        eval (cached once per evaluation — SURVEY.md §3.3) and by most
        loss functions."""
        raise NotImplementedError

    def predict_pairs(self, params, consts, extras, users, items):
        u, i = self.propagate(params, consts, extras)
        return jnp.sum(u[users] * i[items], axis=-1)


class SocialRecommender(GeneralGraphRecommender):
    """Social models: adds the normalized U-U social graph (reference:
    abstract_recommender.py:23-30 + SocialDataset)."""

    model_type = ModelType.SOCIAL

    def __init__(self, config, dataset):
        BaseRecommender.__init__(self, config, dataset)
        # social models build their own graphs from the dataset; the
        # joint U-I adjacency is added by subclasses that need it.
        self.dataset_ref_for_build = None


class SequentialRecommender(BaseRecommender):
    """Session-graph / sequence models.  Batches carry padded session
    arrays (data/session.py); scoring is full-catalog logits."""

    model_type = ModelType.SEQUENTIAL
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.max_seq_len = int(config.get("MAX_ITEM_LIST_LENGTH", 50))

    def full_scores(self, params: Params, consts: Consts, extras: Extras,
                    batch: Batch, rng: jax.Array, train: bool
                    ) -> jax.Array:
        """(B, n_items) logits over the catalog (col 0 = PAD)."""
        raise NotImplementedError

    def calculate_loss(self, params, consts, extras, batch, rng, mode=0):
        from recbole_gnn_tpu.models.losses import cross_entropy
        logits = self.full_scores(params, consts, extras, batch, rng, True)
        loss = cross_entropy(logits, batch["item_id"], batch.get("weight"))
        return loss, {"ce": loss}
