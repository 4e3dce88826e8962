"""Model assembly: config -> pure-functional encoder/decoder model.

The TPU-native counterpart of ``code/common/model_builder.py`` plus the
high-level API of ``code/model.py``: one ``RGCNModel`` object holds the
static structure (from RunConfig) and exposes init / encode / loss /
score_all_* as jit-friendly pure functions over an explicit params pytree.

Train vs test mode in the reference is two cached TF subgraphs
(``message_gcn.py:13,50``); here it is the same function with a
``deterministic`` flag and a different GraphBatch (sampled split vs full
training graph).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..graph import GraphBatch
from ..ops.neg_energy import (factored_negative_energies,
                              single_factor_negative_energies)
from . import decoders as decoders_lib
from . import encoders as enc


def binomial_factored_objective(decoder, pos_energy, neg_energy, ev_sq,
                                e1, r, e2, pos_mask, corrupt_object,
                                axis_name=None):
    """CE + regularization of the factored binomial protocol, shared by
    the single-chip/mesh loss (``loss_binomial_factored``) and the
    vertex-sharded loss (parallel/vertex_sharded.py), which computes the
    energies against halo-gathered codes. Exact math of the reference's
    tiled objective (``auxilliaries.py:13-33`` + ``bilinear_diag.py``).

    pos_energy [n]; neg_energy/ev_sq/corrupt_object [n, rate];
    e1/r/e2 [n, d] positive codes; pos_mask [n]. Under ``axis_name``
    every sum is psummed, so per-shard slices produce the global mean.
    """
    rate = neg_energy.shape[1]
    n = pos_energy.shape[0]
    energies = jnp.concatenate([pos_energy, neg_energy.reshape(-1)])
    labels = jnp.concatenate(
        [pos_mask, jnp.zeros((n * rate,), jnp.float32)])
    # neg_energy is positive-major ([n, rate] flattened), so the mask
    # repeats per positive (the tiled batch's layout is slot-major;
    # the CE mean is order-independent).
    mask = jnp.concatenate([pos_mask, jnp.repeat(pos_mask, rate)])
    loss = decoders_lib.weighted_ce_loss(energies, labels, mask,
                                         axis_name)

    # Regularization means over the EQUIVALENT tiled rows
    # (``bilinear_diag.py:63-69``): in the tiled batch, positive i's
    # e1 survives in its positive row and its object-corrupted rows,
    # e2 in its positive + subject-corrupted rows, r in all rate+1
    # rows; each corrupted entity code appears once.
    m = pos_mask
    co = corrupt_object.astype(jnp.float32) * m[:, None]
    n_obj = jnp.sum(co, axis=1)                                # [n]
    n_subj = m * rate - n_obj
    e1_sq = (jnp.sum(jnp.sum(e1.astype(jnp.float32) ** 2, -1)
                     * m * (1.0 + n_obj))
             + jnp.sum(ev_sq * (m[:, None] - co)))
    e2_sq = (jnp.sum(jnp.sum(e2.astype(jnp.float32) ** 2, -1)
                     * m * (1.0 + n_subj))
             + jnp.sum(ev_sq * co))
    r_sq = jnp.sum(jnp.sum(r.astype(jnp.float32) ** 2, -1) * m) \
        * (rate + 1)
    d = e1.shape[-1]
    live = jnp.sum(m)
    if axis_name is not None:
        e1_sq = jax.lax.psum(e1_sq, axis_name)
        e2_sq = jax.lax.psum(e2_sq, axis_name)
        r_sq = jax.lax.psum(r_sq, axis_name)
        live = jax.lax.psum(live, axis_name)
    # Clamp AFTER the global reduction: a shard whose slice is all
    # padding must contribute 0 to the denominator, not a phantom 1
    # (single-chip semantics: max(total live, 1)).
    count = jnp.maximum(live, 1.0) * (rate + 1) * d
    reg = (e1_sq + e2_sq + r_sq) / count
    return loss + decoder.regularization_parameter * reg


class EncodeResult(NamedTuple):
    entity_codes: jax.Array    # [V, d]
    relation_codes: jax.Array  # [R, d]
    # For variational encoders, the pre-noise statistics (KL penalty inputs):
    mu: Optional[jax.Array] = None
    log_sigma: Optional[jax.Array] = None


class RGCNModel:
    """Encoder/decoder pair with the reference's full config surface."""

    def __init__(self, config: RunConfig):
        if config.entity_count <= 0:
            raise ValueError("config must carry dataset counts; call "
                             "config.with_counts(...) first")
        self.config = config
        e = config.encoder
        self.decoder = decoders_lib.build_decoder(
            config.decoder.name,
            code_dimension=config.decoder.code_dimension,
            regularization_parameter=config.decoder.regularization_parameter,
            decoder_dimension=config.decoder.decoder_dimension,
            embedding_width=config.decoder.embedding_width,
        )
        self.n_entities = config.entity_count
        self.n_relations = config.relation_count
        # Training-loss decoder stream precision (docs/ROOFLINE.md §4):
        # bf16 halves the [rate+1)·N, d] gather/product HBM traffic that
        # dominates the train step; reductions stay f32. Evaluation
        # scoring paths are unaffected.
        self._dec_dtype = (jnp.bfloat16 if config.decoder.stream_precision
                           in ("bfloat16", "bf16") else None)

        self.is_gcn = e.name in ("gcn_basis", "gcn_diag", "variational_gcn_basis")
        self.variational = e.name in ("variational_embedding",
                                      "variational_gcn_basis")
        # First GCN layer consumes one-hot input iff there is no input stage
        # (``model_builder.apply_basis_gcn`` onehot logic, lines 277-283).
        self.first_layer_onehot = (
            self.is_gcn and not e.use_input_transform and not e.random_input
            and not e.partially_random_input)
        if e.name == "gcn_diag":
            # gcn_diag always builds an input transform (model_builder.py:89).
            self.first_layer_onehot = False

    # ------------------------------------------------------------------
    # Parameter initialization
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Dict:
        cfg = self.config
        e = cfg.encoder
        keys = iter(jax.random.split(key, 64))
        params: Dict = {}

        if e.name == "embedding":
            params["embedding"] = enc.init_affine(
                next(keys), (self.n_entities, e.code_dimension), use_bias=False)
        elif e.name == "variational_embedding":
            params["mu_embedding"] = enc.init_affine(
                next(keys), (self.n_entities, e.code_dimension), use_bias=False)
            params["sigma_embedding"] = enc.init_affine(
                next(keys), (self.n_entities, e.code_dimension), use_bias=False)
        elif self.is_gcn:
            d_int = e.internal_dimension
            if e.name == "gcn_diag" or e.use_input_transform:
                params["input_transform"] = enc.init_affine(
                    next(keys), (self.n_entities, d_int), use_bias=True)
            if e.partially_random_input:
                params["input_transform"] = enc.init_affine(
                    next(keys), (self.n_entities, d_int), use_bias=True)

            variant = "diag" if e.name == "gcn_diag" else e.gcn_variant
            layers = []
            highways = []
            for layer in range(e.n_layers):
                onehot = self.first_layer_onehot and layer == 0
                layers.append(enc.init_gcn_layer(
                    next(keys), variant,
                    n_relations=self.n_relations,
                    d_in=d_int, d_out=d_int, n_bases=e.n_bases,
                    onehot_dim=self.n_entities if onehot else None))
                if e.skip_connections == "Highway" and not onehot:
                    highways.append(enc.init_highway(next(keys), (d_int, d_int)))
                else:
                    highways.append(None)
            params["gcn_layers"] = layers
            if any(h is not None for h in highways):
                params["highways"] = highways

            if e.name == "variational_gcn_basis":
                params["mu_projection"] = enc.init_affine(
                    next(keys), (d_int, e.code_dimension), use_bias=True)
                params["sigma_projection"] = enc.init_affine(
                    next(keys), (d_int, e.code_dimension), use_bias=True)
            if e.use_output_transform:
                params["output_transform"] = enc.init_affine(
                    next(keys), (d_int, e.code_dimension), use_bias=True)
        else:
            raise ValueError(f"unknown encoder {e.name!r}")

        params["relation_embedding"] = enc.init_relation_embedding(
            next(keys), self.n_relations, e.code_dimension)
        params["decoder"] = self.decoder.init(next(keys))
        return params

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------
    def needs_graph(self) -> bool:
        return self.is_gcn

    @property
    def has_state(self) -> bool:
        """True for the stored-message (incremental) encoder variant, whose
        layers carry message caches threaded through each train step."""
        e = self.config.encoder
        return (self.is_gcn and e.name != "gcn_diag"
                and e.gcn_variant == "basis_stored")

    def init_cache_state(self) -> list:
        """Per-layer stored-message caches (``gcn_basis_stored.py:33-35``)."""
        e = self.config.encoder
        return [enc.init_stored_state(self.config.edge_count,
                                      self.n_entities, e.internal_dimension)
                for _ in range(e.n_layers)]

    def encode_stateful(self, params: Dict, state: list, graph: GraphBatch,
                        edge_ids: jax.Array, *, rng: jax.Array
                        ) -> Tuple[EncodeResult, list]:
        """Train-mode encode for the stored-message variant: like encode()
        but each layer consumes and produces its cache state."""
        e = self.config.encoder
        assert self.has_state
        if e.use_input_transform:
            features = enc.apply_affine(params["input_transform"], None,
                                        onehot_input=True, use_bias=True,
                                        use_nonlinearity=True)
        else:
            features = None
        new_state = []
        for layer_idx, layer_params in enumerate(params["gcn_layers"]):
            use_nonlinearity = layer_idx < e.n_layers - 1
            features, st = enc.apply_gcn_layer_stored(
                layer_params, state[layer_idx], graph, features, edge_ids,
                n_bases=e.n_bases, use_nonlinearity=use_nonlinearity,
                dropout_keep=e.dropout_keep_probability,
                deterministic=False,
                rng=jax.random.fold_in(rng, 100 + layer_idx),
                n_vertices=self.n_entities)
            new_state.append(st)
        if e.use_output_transform:
            features = enc.apply_affine(params["output_transform"], features,
                                        use_bias=True)
        rel = params["relation_embedding"]["W_relation"]
        return EncodeResult(features, rel), new_state

    def loss_stateful(self, params: Dict, state: list, graph: GraphBatch,
                      edge_ids: jax.Array, triples: jax.Array,
                      labels: jax.Array, mask: Optional[jax.Array] = None,
                      *, rng: jax.Array) -> Tuple[jax.Array, list]:
        """Training loss for the stored variant; returns (loss, new_state).
        The cache updates are treated as non-differentiable side state, as
        in the reference (scatter ops outside the gradient path)."""
        encoded, new_state = self.encode_stateful(params, state, graph,
                                                  edge_ids, rng=rng)
        new_state = jax.lax.stop_gradient(new_state)
        e1, r, e2 = self.gather_codes(encoded, triples)
        energies = self.decoder.energies(params["decoder"], e1, r, e2)
        loss = decoders_lib.weighted_ce_loss(energies, labels, mask)
        loss = loss + self.decoder.regularization(params["decoder"], e1, r,
                                                  e2, mask)
        return loss, new_state

    @property
    def preferred_bucket_size(self) -> Optional[int]:
        """Relation-bucket size for the GraphBatch layout. Block-diagonal
        layers gather per-relation weight stacks; bucketing loads each
        stack once per bucket instead of once per edge."""
        e = self.config.encoder
        if self.is_gcn and e.name != "gcn_diag" and e.gcn_variant == "block":
            return 64
        return None

    @property
    def preferred_staircase2(self) -> bool:
        """Whether the fused v2 aggregation kernel (ops/staircase2.py)
        applies: block/basis GCN variants with dense layer input (i.e. an
        input transform precedes the first GCN layer)."""
        e = self.config.encoder
        return (self.is_gcn and not self.has_state
                and e.use_input_transform
                and e.gcn_variant in ("block", "basis"))

    def make_graph(self, triples, pad_to: Optional[int] = None,
                   shard_align: int = 8, to_device: bool = True,
                   staircase: Optional[bool] = None,
                   sc_shards: int = 1,
                   staircase2: Optional[bool] = None) -> GraphBatch:
        """Build a GraphBatch in this model's preferred layout.

        For bucketed layouts, pass the same ``pad_to`` upper bound every
        step (e.g. split_size + R * (bucket_size - 1)) to keep shapes
        static across resampled subgraphs.

        staircase2: build the FUSED v2 layouts (ops/staircase2.py) —
        gather + relational transform + scatter in one kernel pass per
        direction. Default: on for block/basis models with an input
        transform (``preferred_staircase2``); the v1 layouts are skipped
        in that case (they'd be dead weight). With sc_shards > 1 the
        layouts are shard-local so the fused kernel runs under the mesh.

        staircase: build the per-direction v1 staircase scatter layouts
        (ops/staircase.py). Default: on for GCN variants not covered by
        v2.
        """
        from ..graph import build_graph_batch
        if staircase2 is None:
            staircase2 = self.preferred_staircase2
        bucket = self.preferred_bucket_size
        if staircase2:
            # the fused kernel needs no relation bucketing; the plain
            # layout keeps the pad size smaller
            bucket = None
        if staircase is None:
            staircase = self.is_gcn and not self.has_state \
                and not staircase2
        # The stored variant indexes message caches by batch edge id, so
        # its graphs must preserve the input edge order.
        sort_directions = not (self.has_state or bucket or staircase
                               or staircase2)
        return build_graph_batch(
            triples, self.n_entities, self.n_relations, pad_to=pad_to,
            bucket_size=bucket, shard_align=shard_align,
            sort_directions=sort_directions, to_device=to_device,
            staircase=staircase, sc_shards=sc_shards,
            staircase2=staircase2)

    def graph_pad_bound(self, n_edges: int, sharded: bool = False) -> int:
        """A fixed pad size that accommodates any n_edges-edge subgraph in
        the preferred layout (worst-case relation-padding included).
        ``sharded``: bound for a multi-chip layout (relation bucketing
        still applies to variants not covered by the fused v2 layout)."""
        b = self.preferred_bucket_size
        if b is None or self.preferred_staircase2:
            # plain / fused-v2 layouts carry no relation padding
            return max(-(-n_edges // 128) * 128, 128)
        return n_edges + self.n_relations * (b - 1)

    def encode(self, params: Dict, graph: Optional[GraphBatch], *,
               deterministic: bool, rng: Optional[jax.Array] = None,
               axis_name: Optional[str] = None) -> EncodeResult:
        """Compute all-entity codes [V, d] and relation codes [R, d].

        axis_name: mesh axis over which the graph's edges are sharded
        (edge-partitioned multi-chip execution); entity codes come back
        replicated on every device.
        """
        cfg = self.config
        e = cfg.encoder
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rel = params["relation_embedding"]["W_relation"]

        if e.name == "embedding":
            codes = enc.apply_affine(params["embedding"], None,
                                     onehot_input=True, use_bias=False)
            return EncodeResult(codes, rel)

        if e.name == "variational_embedding":
            mu = enc.apply_affine(params["mu_embedding"], None,
                                  onehot_input=True, use_bias=False)
            log_sigma = enc.apply_affine(params["sigma_embedding"], None,
                                         onehot_input=True, use_bias=False)
            z = enc.apply_variational(jax.random.fold_in(rng, 17), mu,
                                      log_sigma)
            return EncodeResult(z, rel, mu=mu, log_sigma=log_sigma)

        assert graph is not None, "GCN encoders require a GraphBatch"
        d_int = e.internal_dimension

        # --- input stage -------------------------------------------------
        mu = log_sigma = None
        if e.name == "gcn_diag" or e.use_input_transform:
            features = enc.apply_affine(params["input_transform"], None,
                                        onehot_input=True, use_bias=True,
                                        use_nonlinearity=True)
        elif e.random_input:
            features = enc.random_embedding(jax.random.fold_in(rng, 23),
                                            self.n_entities, d_int)
        elif e.partially_random_input:
            c1 = enc.apply_affine(params["input_transform"], None,
                                  onehot_input=True, use_bias=True,
                                  use_nonlinearity=False)
            c2 = enc.random_embedding(jax.random.fold_in(rng, 23),
                                      self.n_entities, d_int)
            features = enc.apply_dropover(jax.random.fold_in(rng, 29), c1, c2,
                                          deterministic)
        else:
            features = None  # one-hot first layer

        # --- message-passing layers -------------------------------------
        variant = "diag" if e.name == "gcn_diag" else e.gcn_variant
        highways = params.get("highways")
        agg_dtype = (jnp.bfloat16 if e.message_precision
                     in ("bfloat16", "bf16") else None)
        for layer_idx, layer_params in enumerate(params["gcn_layers"]):
            use_nonlinearity = layer_idx < e.n_layers - 1
            new_features = enc.apply_gcn_layer(
                layer_params, variant, graph, features,
                n_bases=e.n_bases, use_nonlinearity=use_nonlinearity,
                dropout_keep=e.dropout_keep_probability,
                deterministic=deterministic,
                rng=jax.random.fold_in(rng, 100 + layer_idx),
                n_vertices=self.n_entities, axis_name=axis_name,
                agg_dtype=agg_dtype)
            if features is not None and e.skip_connections == "Highway":
                new_features = enc.apply_highway(highways[layer_idx],
                                                 new_features, features)
            elif features is not None and e.skip_connections == "Residual":
                new_features = enc.apply_residual(new_features, features)
            features = new_features

        # --- variational / output stages ---------------------------------
        if e.name == "variational_gcn_basis":
            mu = enc.apply_affine(params["mu_projection"], features,
                                  use_bias=True)
            log_sigma = enc.apply_affine(params["sigma_projection"], features,
                                         use_bias=True)
            features = enc.apply_variational(jax.random.fold_in(rng, 31),
                                             mu, log_sigma)
        if e.use_output_transform:
            features = enc.apply_affine(params["output_transform"], features,
                                        use_bias=True)

        return EncodeResult(features, rel, mu=mu, log_sigma=log_sigma)

    # ------------------------------------------------------------------
    # Losses and scoring
    # ------------------------------------------------------------------
    def _stream_cast(self, encoded: EncodeResult) -> EncodeResult:
        """Cast codes to the decoder stream dtype (training losses only)."""
        if self._dec_dtype is None:
            return encoded
        return encoded._replace(
            entity_codes=encoded.entity_codes.astype(self._dec_dtype),
            relation_codes=encoded.relation_codes.astype(self._dec_dtype))

    def gather_codes(self, encoded: EncodeResult, triples: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(e1, r, e2) code gather (``bilinear_diag.py:14-24``)."""
        e1 = encoded.entity_codes[triples[:, 0]]
        r = encoded.relation_codes[triples[:, 1]]
        e2 = encoded.entity_codes[triples[:, 2]]
        return e1, r, e2

    def loss(self, params: Dict, graph: Optional[GraphBatch],
             triples: jax.Array, labels: jax.Array,
             mask: Optional[jax.Array] = None, *,
             rng: Optional[jax.Array] = None,
             deterministic: bool = False,
             axis_name: Optional[str] = None) -> jax.Array:
        """Training loss = mean weighted CE + regularization
        (``train.py:262``: get_loss + get_regularization).

        With axis_name set, graph edges AND loss triples are sharded over
        that mesh axis; the returned scalar is the exact global loss (all
        cross-device reductions happen inside)."""
        encoded = self.encode(params, graph, deterministic=deterministic,
                              rng=rng, axis_name=axis_name)
        encoded = self._stream_cast(encoded)
        e1, r, e2 = self.gather_codes(encoded, triples)
        energies = self.decoder.energies(params["decoder"], e1, r, e2)
        loss = decoders_lib.weighted_ce_loss(energies, labels, mask,
                                             axis_name)
        loss = loss + self.decoder.regularization(params["decoder"], e1, r,
                                                  e2, mask, axis_name)
        if self.variational and encoded.mu is not None:
            loss = loss + enc.variational_kl_penalty(encoded.mu,
                                                     encoded.log_sigma)
        return loss

    def loss_binomial_factored(self, params: Dict,
                               graph: Optional[GraphBatch],
                               positives: jax.Array, pos_mask: jax.Array,
                               neg_values: jax.Array,
                               corrupt_object: jax.Array, *,
                               rng: Optional[jax.Array] = None,
                               deterministic: bool = False,
                               axis_name: Optional[str] = None
                               ) -> jax.Array:
        """The reference's EXACT binomial-corruption objective
        (``auxilliaries.py:13-33`` + ``bilinear_diag.py:27-34``), computed
        without materializing the (rate+1)-tiled triple batch.

        Every negative shares two of its three codes with its positive
        (the coin flip replaces one entity slot), and bilinear decoders
        score a candidate entity against a per-positive factor
        (``subject_factor`` / ``object_factor``). So instead of gathering
        3 codes for each of (rate+1)·n tiled rows (~33n rows of HBM
        traffic), gather the n positives' codes + 2n factors + rate·n
        corrupted-entity codes (~15n rows) and select per-slot by the
        coin flip. Same per-slot Bernoulli protocol, same CE mean, same
        regularization means over the equivalent tiled rows — with
        matched corruption draws (``device_negative_parts``) the loss
        equals ``loss`` on ``device_negative_sample``'s tiled batch to
        float tolerance (tests/test_factored_binomial.py).

        positives: [n, 3]; pos_mask: [n]; neg_values: [n, rate] corrupted
        entity ids; corrupt_object: [n, rate] bool (True -> object slot
        replaced). Requires a factorizable decoder (DistMult/ComplEx).
        """
        if not getattr(self.decoder, "factorizable", False):
            raise ValueError(f"decoder {self.decoder.name} does not support "
                             "the factored binomial loss")
        encoded = self.encode(params, graph, deterministic=deterministic,
                              rng=rng, axis_name=axis_name)
        encoded = self._stream_cast(encoded)
        e1, r, e2 = self.gather_codes(encoded, positives)
        dp = params["decoder"]
        codes = encoded.entity_codes

        pos_energy = self.decoder.energies(dp, e1, r, e2)          # [n]
        q_subj = self.decoder.subject_factor(dp, r, e2)            # [n, d]
        q_obj = self.decoder.object_factor(dp, e1, r)              # [n, d]
        # factored_energy is a plain f32-accumulated dot for every
        # factorizable decoder, so the fused op's split form
        # es + co*(eo - es) is the same energy. The op also carries the
        # sum-of-squares of the gathered corrupted codes for the
        # regularization mean, and its custom backward replaces the
        # ~30 GB/s scatter-add of the [n*k, d] cotangent with a windowed
        # one-hot MXU accumulation fed from the small factor tables
        # (ops/neg_energy.py; ~2x faster decoder backward measured).
        neg_energy, ev_sq = factored_negative_energies(
            codes, q_subj, q_obj, neg_values, corrupt_object)
        loss = binomial_factored_objective(
            self.decoder, pos_energy, neg_energy, ev_sq, e1, r, e2,
            pos_mask, corrupt_object, axis_name=axis_name)

        if self.variational and encoded.mu is not None:
            loss = loss + enc.variational_kl_penalty(encoded.mu,
                                                     encoded.log_sigma)
        return loss

    def loss_structured(self, params: Dict, graph: Optional[GraphBatch],
                        positives: jax.Array, pos_mask: jax.Array,
                        neg_subjects: jax.Array, neg_objects: jax.Array, *,
                        rng: Optional[jax.Array] = None,
                        deterministic: bool = False,
                        axis_name: Optional[str] = None) -> jax.Array:
        """Structured-negatives training loss (fast path).

        Mathematically the same objective as ``loss`` on the tiled batch
        [positives; subject-corruptions; object-corruptions], but exploits
        that every corruption of a positive shares two of its three codes:
        only ONE factor per positive is gathered (decoder.subject_factor /
        object_factor) plus one code per corrupted entity — ~2.5x fewer
        gathered rows than materializing the (rate+1)-tiled batch, and the
        same factor reuse on the backward scatters.

        positives: [n, 3]; pos_mask: [n]; neg_subjects/neg_objects:
        [n, k] corrupted-entity ids (k = rate - rate//2 / rate//2).
        Requires a factorizable decoder (DistMult / ComplEx).
        """
        if not getattr(self.decoder, "factorizable", False):
            raise ValueError(f"decoder {self.decoder.name} does not support "
                             "the structured-negatives loss")
        encoded = self.encode(params, graph, deterministic=deterministic,
                              rng=rng, axis_name=axis_name)
        encoded = self._stream_cast(encoded)
        e1, r, e2 = self.gather_codes(encoded, positives)
        dp = params["decoder"]
        codes = encoded.entity_codes

        pos_energy = self.decoder.energies(dp, e1, r, e2)          # [n]
        q_subj = self.decoder.subject_factor(dp, r, e2)            # [n, d]
        q_obj = self.decoder.object_factor(dp, e1, r)              # [n, d]

        k_s = neg_subjects.shape[1]
        k_o = neg_objects.shape[1]
        # Fused single-factor scoring (ops/neg_energy.py): same
        # rank-structured backward as the binomial op — the windowed
        # one-hot MXU accumulation replaces the ~30 GB/s scatter of the
        # corrupted-code cotangents. ev_sq feeds the regularization.
        subj_energy, e1n_sq = single_factor_negative_energies(
            codes, q_subj, neg_subjects)                           # [n,ks]
        obj_energy, e2n_sq = single_factor_negative_energies(
            codes, q_obj, neg_objects)                             # [n,ko]

        # CE: positives labeled by pos_mask; all corruptions labeled 0.
        ce = decoders_lib.weighted_ce_loss
        n = positives.shape[0]
        energies = jnp.concatenate(
            [pos_energy, subj_energy.reshape(-1), obj_energy.reshape(-1)])
        labels = jnp.concatenate(
            [pos_mask, jnp.zeros((n * (k_s + k_o),), jnp.float32)])
        mask = jnp.concatenate(
            [pos_mask, jnp.tile(pos_mask, k_s), jnp.tile(pos_mask, k_o)])
        loss = ce(energies, labels, mask, axis_name)

        # Regularization over the equivalent tiled batch: each positive's
        # e1 appears (1 + k_o) times (positive + object corruptions), e2
        # (1 + k_s) times, r every row; corrupted codes once each.
        rows = 1 + k_s + k_o
        d = e1.shape[-1]
        m = pos_mask
        count = jnp.maximum(jnp.sum(m), 1.0) * rows * d

        def msum(x, w):
            return jnp.sum(jnp.sum(x ** 2, axis=-1) * w)

        e1_sq = (msum(e1, m) * (1 + k_o)
                 + jnp.sum(e1n_sq * m[:, None]))
        e2_sq = (msum(e2, m) * (1 + k_s)
                 + jnp.sum(e2n_sq * m[:, None]))
        r_sq = msum(r, m) * rows
        if axis_name is not None:
            e1_sq = jax.lax.psum(e1_sq, axis_name)
            e2_sq = jax.lax.psum(e2_sq, axis_name)
            r_sq = jax.lax.psum(r_sq, axis_name)
            count = jax.lax.psum(count, axis_name)
        reg = (e1_sq + e2_sq + r_sq) / count
        loss = loss + self.decoder.regularization_parameter * reg

        if self.variational and encoded.mu is not None:
            loss = loss + enc.variational_kl_penalty(encoded.mu,
                                                     encoded.log_sigma)
        return loss

    def loss_shared_negatives(self, params: Dict,
                              graph: Optional[GraphBatch],
                              positives: jax.Array, pos_mask: jax.Array,
                              neg_pool: jax.Array, *,
                              rng: Optional[jax.Array] = None,
                              deterministic: bool = False,
                              axis_name: Optional[str] = None) -> jax.Array:
        """Shared-negative-pool loss (MXU fast path).

        All positives score against ONE pool of uniformly drawn candidate
        entities, as both corrupted subjects and corrupted objects — two
        [n, d] x [d, P] GEMMs instead of per-positive row gathers. This is
        the shared/negative-pool protocol standard in modern KGE systems.
        Each positive contributes 1 positive row and 2P negative rows to
        the flat CE mean, so the objective matches a per-positive
        corruption batch with rate = 2P (a different negative distribution
        and weighting than the reference's protocol — a capability/perf
        mode, not a parity mode).

        neg_pool: [P] entity ids.
        """
        if not getattr(self.decoder, "factorizable", False):
            raise ValueError(f"decoder {self.decoder.name} does not support "
                             "the shared-negatives loss")
        encoded = self.encode(params, graph, deterministic=deterministic,
                              rng=rng, axis_name=axis_name)
        encoded = self._stream_cast(encoded)
        e1, r, e2 = self.gather_codes(encoded, positives)
        dp = params["decoder"]
        pool = encoded.entity_codes[neg_pool]                      # [P, d]

        pos_energy = self.decoder.energies(dp, e1, r, e2)          # [n]
        q_subj = self.decoder.subject_factor(dp, r, e2)            # [n, d]
        q_obj = self.decoder.object_factor(dp, e1, r)              # [n, d]
        subj_energy = jnp.dot(q_subj, pool.T,
                              preferred_element_type=jnp.float32)  # [n, P]
        obj_energy = jnp.dot(q_obj, pool.T,
                             preferred_element_type=jnp.float32)   # [n, P]

        ce = decoders_lib.weighted_ce_loss
        p = neg_pool.shape[0]
        energies = jnp.concatenate(
            [pos_energy, subj_energy.reshape(-1), obj_energy.reshape(-1)])
        n = positives.shape[0]
        labels = jnp.concatenate(
            [pos_mask, jnp.zeros((2 * n * p,), jnp.float32)])
        mask = jnp.concatenate([pos_mask, jnp.tile(pos_mask, 2 * p)])
        loss = ce(energies, labels, mask, axis_name)

        # Regularization over the equivalent batch rows (each positive's
        # codes appear (1 + p) / (1 + p) times; pool codes n times each).
        rows = 1 + 2 * p
        d = e1.shape[-1]
        m = pos_mask
        count = jnp.maximum(jnp.sum(m), 1.0) * rows * d

        def msum(x, w):
            return jnp.sum(jnp.sum(x ** 2, axis=-1) * w)

        n_real = jnp.maximum(jnp.sum(m), 1.0)
        e1_sq = msum(e1, m) * (1 + p) + jnp.sum(pool ** 2) * n_real
        e2_sq = msum(e2, m) * (1 + p) + jnp.sum(pool ** 2) * n_real
        r_sq = msum(r, m) * rows
        if axis_name is not None:
            e1_sq = jax.lax.psum(e1_sq, axis_name)
            e2_sq = jax.lax.psum(e2_sq, axis_name)
            r_sq = jax.lax.psum(r_sq, axis_name)
            count = jax.lax.psum(count, axis_name)
        reg = (e1_sq + e2_sq + r_sq) / count
        loss = loss + self.decoder.regularization_parameter * reg

        if self.variational and encoded.mu is not None:
            loss = loss + enc.variational_kl_penalty(encoded.mu,
                                                     encoded.log_sigma)
        return loss

    def score(self, params: Dict, graph: Optional[GraphBatch],
              triples: jax.Array) -> jax.Array:
        """sigmoid(energies) for given triples, test mode
        (``bilinear_diag.py:46-49``)."""
        encoded = self.encode(params, graph, deterministic=True)
        e1, r, e2 = self.gather_codes(encoded, triples)
        return jax.nn.sigmoid(
            self.decoder.energies(params["decoder"], e1, r, e2))

    def score_all_subjects(self, params: Dict, graph: Optional[GraphBatch],
                           triples: jax.Array,
                           apply_sigmoid: bool = True) -> jax.Array:
        """[N, V] candidate-subject scores (``bilinear_diag.py:51-55``)."""
        encoded = self.encode(params, graph, deterministic=True)
        _, r, e2 = self.gather_codes(encoded, triples)
        energies = self.decoder.all_subject_energies(
            params["decoder"], encoded.entity_codes, r, e2)
        return jax.nn.sigmoid(energies) if apply_sigmoid else energies

    def score_all_objects(self, params: Dict, graph: Optional[GraphBatch],
                          triples: jax.Array,
                          apply_sigmoid: bool = True) -> jax.Array:
        encoded = self.encode(params, graph, deterministic=True)
        e1, r, _ = self.gather_codes(encoded, triples)
        energies = self.decoder.all_object_energies(
            params["decoder"], encoded.entity_codes, e1, r)
        return jax.nn.sigmoid(energies) if apply_sigmoid else energies


class JittedModelView:
    """Jit-compiled scoring view over an RGCNModel.

    The reference lazily builds three dedicated prediction graphs and reuses
    them per session.run (``model.py:46-81``) — but re-encodes the FULL
    training graph for every 1000-triple chunk. Here the test-mode entity
    codes are computed once per (params, graph) pair and chunk scoring is
    just the decoder GEMM; one compiled executable per entry point.
    Presents the same (params, graph, triples) surface as RGCNModel so it
    can be handed directly to evaluation.Scorer.

    mesh: a jax.sharding.Mesh for multi-chip evaluation. The encode pass
    runs edge-sharded (shard_map + psum, exactly the training-step
    aggregation; requires the graph to carry host-precomputed norms and,
    for the staircase path, sc_shards == mesh size); the all-entity
    decoder GEMMs shard the TRIPLE axis across devices, so each chip
    scores 1/N of every evaluation chunk against the full entity table.
    """

    def __init__(self, model: "RGCNModel", mesh=None):
        self.model = model
        self.mesh = mesh
        self._n_dev = int(mesh.devices.size) if mesh is not None else 1
        dec = model.decoder

        if mesh is None:
            self._encode = jax.jit(
                lambda p, g: model.encode(p, g, deterministic=True))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import EDGE_AXIS, _graph_specs, \
                _mesh_compatible
            try:
                shard_map = jax.shard_map
            except AttributeError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map
            self._data_sharding = NamedSharding(mesh, P(EDGE_AXIS))
            self._rep_sharding = NamedSharding(mesh, P())
            self._mesh_compatible = _mesh_compatible

            def enc_sharded(p, g):
                return model.encode(p, g, deterministic=True,
                                    axis_name=EDGE_AXIS)

            # One jitted executable per graph treedef (rebuilt only if the
            # graph layout changes, not per validation check).
            enc_cache = {}

            def encode(p, g):
                if g is None:
                    key = None
                    if key not in enc_cache:
                        enc_cache[key] = jax.jit(
                            lambda p, g: model.encode(p, None,
                                                      deterministic=True))
                    return enc_cache[key](p, g)
                key = jax.tree_util.tree_structure(g)
                if key not in enc_cache:
                    enc_cache[key] = jax.jit(shard_map(
                        enc_sharded, mesh=mesh,
                        in_specs=(P(), _graph_specs(g)), out_specs=P(),
                        check_vma=False))
                return enc_cache[key](p, g)

            self._encode = encode

        def gather(enc, t):
            return (enc.entity_codes[t[:, 0]], enc.relation_codes[t[:, 1]],
                    enc.entity_codes[t[:, 2]])

        def subj(p, enc, t, sig):
            _, r, e2 = gather(enc, t)
            en = dec.all_subject_energies(p["decoder"], enc.entity_codes,
                                          r, e2)
            return jax.nn.sigmoid(en) if sig else en

        def obj(p, enc, t, sig):
            e1, r, _ = gather(enc, t)
            en = dec.all_object_energies(p["decoder"], enc.entity_codes,
                                         e1, r)
            return jax.nn.sigmoid(en) if sig else en

        def score(p, enc, t):
            e1, r, e2 = gather(enc, t)
            return jax.nn.sigmoid(dec.energies(p["decoder"], e1, r, e2))

        self._subj = jax.jit(functools.partial(subj, sig=False))
        self._subj_sig = jax.jit(functools.partial(subj, sig=True))
        self._obj = jax.jit(functools.partial(obj, sig=False))
        self._obj_sig = jax.jit(functools.partial(obj, sig=True))
        self._score = jax.jit(score)
        self._enc_key = None
        self._enc_val = None

    def invalidate(self) -> None:
        self._enc_key = None
        self._enc_val = None

    def _encoded(self, params, graph):
        # Cache key holds STRONG references and compares with `is`: an
        # id()-keyed cache would be unsound (CPython recycles ids after GC,
        # so fresh params could silently hit a stale entry).
        if (self._enc_key is None or self._enc_key[0] is not params
                or self._enc_key[1] is not graph):
            p, g = params, graph
            if self.mesh is not None:
                p = jax.device_put(p, self._rep_sharding)
                if g is not None:
                    g = self._mesh_compatible(g, self._n_dev)
                    g = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, self._data_sharding), g)
            self._enc_params = p
            self._enc_val = self._encode(p, g)
            self._enc_key = (params, graph)
        return self._enc_params, self._enc_val

    def _place_triples(self, triples):
        """Device placement for a triple chunk: replicated single-chip,
        row-sharded (padded to the mesh size) multi-chip."""
        t = jnp.asarray(triples)
        if self.mesh is None:
            return t, t.shape[0]
        t = np.asarray(triples, dtype=np.int32).reshape(-1, 3)
        n = t.shape[0]
        pad = -(-n // self._n_dev) * self._n_dev
        if pad != n:
            t = np.concatenate([t, np.repeat(t[-1:], pad - n, axis=0)])
        return jax.device_put(t, self._data_sharding), n

    def score_all_subjects(self, params, graph, triples,
                           apply_sigmoid: bool = True):
        fn = self._subj_sig if apply_sigmoid else self._subj
        p, encoded = self._encoded(params, graph)
        t, n = self._place_triples(triples)
        out = fn(p, encoded, t)
        return out if out.shape[0] == n else out[:n]

    def score_all_objects(self, params, graph, triples,
                          apply_sigmoid: bool = True):
        fn = self._obj_sig if apply_sigmoid else self._obj
        p, encoded = self._encoded(params, graph)
        t, n = self._place_triples(triples)
        out = fn(p, encoded, t)
        return out if out.shape[0] == n else out[:n]

    def score(self, params, graph, triples):
        p, encoded = self._encoded(params, graph)
        t, n = self._place_triples(triples)
        out = self._score(p, encoded, t)
        return out if out.shape[0] == n else out[:n]


def build_model(config: RunConfig) -> RGCNModel:
    return RGCNModel(config)
