"""On-device negative sampling.

Moves the reference's host-side corruption loop (``auxilliaries.py:13-33``)
inside the jitted train step: the host ships only the positive edge batch
(~30k triples) instead of the (rate+1)-times-tiled 330k-triple array, and
the tile + coin-flip + uniform-entity corruption runs on the TPU's PRNG.
Distribution is identical to the host sampler; the random stream is the
device PRNG's.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def device_negative_sample(positives: jax.Array, pos_mask: jax.Array,
                           rate: int, n_entities: int, key: jax.Array
                           ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """positives: [n, 3] int32 (padded rows allowed, pos_mask 0 there).

    Returns (triples [(rate+1)n, 3], labels, mask) matching
    NegativeSampler.transform's layout: first copy positive, negatives
    corrupt subject or object with a fair coin and a uniform entity.
    """
    n = positives.shape[0]
    n_neg = n * rate
    k_coin, k_val = jax.random.split(key)

    tiled = jnp.tile(positives, (rate + 1, 1))
    neg = tiled[n:]
    corrupt_object = jax.random.bernoulli(k_coin, 0.5, (n_neg,))
    values = jax.random.randint(k_val, (n_neg,), 0, n_entities,
                                dtype=positives.dtype)

    s = jnp.where(corrupt_object, neg[:, 0], values)
    o = jnp.where(corrupt_object, values, neg[:, 2])
    neg = jnp.stack([s, neg[:, 1], o], axis=1)

    triples = jnp.concatenate([tiled[:n], neg], axis=0)
    labels = jnp.concatenate([pos_mask,
                              jnp.zeros((n_neg,), jnp.float32)], axis=0)
    mask = jnp.tile(pos_mask, rate + 1)
    return triples, labels, mask


def device_negative_parts(positives: jax.Array, rate: int, n_entities: int,
                          key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """The binomial corruption WITHOUT materializing the tiled batch.

    Draws the exact same random stream as ``device_negative_sample`` (same
    key -> same corruptions, just laid out [n, rate] instead of as tiled
    rows), for the factored binomial loss
    (``RGCNModel.loss_binomial_factored``): each negative shares two of
    its three codes with its positive, so the loss needs only the
    corrupted-entity ids and the subject/object coin flips.

    Returns (values [n, rate] int32 corrupted-entity ids,
             corrupt_object [n, rate] bool — True: the OBJECT slot is
             replaced by the value; False: the subject slot is).
    """
    n = positives.shape[0]
    n_neg = n * rate
    k_coin, k_val = jax.random.split(key)
    # Same flat draws as device_negative_sample; tiled row j*n+i is
    # (positive i, copy j), so reshape(rate, n).T gives [n, rate].
    corrupt_object = jax.random.bernoulli(
        k_coin, 0.5, (n_neg,)).reshape(rate, n).T
    values = jax.random.randint(
        k_val, (n_neg,), 0, n_entities,
        dtype=positives.dtype).reshape(rate, n).T
    return values, corrupt_object


def device_negative_entities_split(positives: jax.Array, rate: int,
                                   n_entities: int, key: jax.Array):
    """Split-protocol corruption for the structured (factorized) loss:
    rate//2 uniform subject corruptions and rate - rate//2 object
    corruptions per positive (deterministic halves instead of the
    reference's per-slot coin flip; same marginal objective).

    Returns (neg_subjects [n, ks], neg_objects [n, ko]) entity ids.
    """
    n = positives.shape[0]
    k_s = rate // 2
    k_o = rate - k_s
    ks_key, ko_key = jax.random.split(key)
    neg_subjects = jax.random.randint(ks_key, (n, k_s), 0, n_entities,
                                      dtype=positives.dtype)
    neg_objects = jax.random.randint(ko_key, (n, k_o), 0, n_entities,
                                     dtype=positives.dtype)
    return neg_subjects, neg_objects
