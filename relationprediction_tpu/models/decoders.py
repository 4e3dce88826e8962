"""Pure-functional decoders: DistMult, ComplEx, and the MLP decoder.

Replaces ``code/decoders/*``. Each decoder exposes:
  init(key, cfg)                      -> params
  energies(params, e1, r, e2)         -> [N] logits for given triples
  all_subject_energies(params, all_codes, r, e2) -> [N, V]
  all_object_energies(params, all_codes, e1, r)  -> [N, V]
  regularization(params, e1, r, e2, mask)        -> scalar

Scores exposed to evaluation are sigmoid(energies), as in the reference;
ranking is monotonic in the logits so rank math may skip the sigmoid.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import sddmm


def masked_mean(x: jax.Array, mask: Optional[jax.Array],
                axis_name: Optional[str] = None) -> jax.Array:
    """Mean over real entries; with ``axis_name``, the mean is global across
    an edge/triple-sharded mesh axis (sums psum'd before dividing)."""
    if mask is None:
        s, c = jnp.sum(x, dtype=jnp.float32), jnp.asarray(x.size,
                                                          jnp.float32)
    else:
        s = jnp.sum(x * mask.astype(x.dtype), dtype=jnp.float32)
        c = jnp.sum(mask, dtype=jnp.float32)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
    return s / jnp.maximum(c, 1.0)


def weighted_ce_loss(energies: jax.Array, labels: jax.Array,
                     mask: Optional[jax.Array] = None,
                     axis_name: Optional[str] = None) -> jax.Array:
    """Mean sigmoid cross-entropy with logits. The reference reads
    NegativeSampleRate as a positive-class weight then overrides it to 1
    (``bilinear_diag.py:32-33``) — so this is plain sigmoid CE; quirk kept.
    """
    # log(1 + exp(-|x|)) + max(x, 0) - x*y  (numerically stable form)
    ce = jnp.maximum(energies, 0.0) - energies * labels + jnp.log1p(
        jnp.exp(-jnp.abs(energies)))
    return masked_mean(ce, mask, axis_name)


class BilinearDiag:
    """DistMult decoder (``decoders/bilinear_diag.py``)."""

    name = "bilinear-diag"

    def __init__(self, dimension: int, regularization_parameter: float):
        self.dimension = dimension
        self.regularization_parameter = regularization_parameter

    def init(self, key) -> Dict:
        return {}

    def energies(self, params, e1, r, e2):
        return sddmm.distmult_energies(e1, r, e2)

    def all_subject_energies(self, params, all_codes, r, e2):
        return sddmm.distmult_all_subjects(all_codes, r, e2)

    def all_object_energies(self, params, all_codes, e1, r):
        return sddmm.distmult_all_objects(all_codes, e1, r)

    # -- factorized scoring (structured negatives fast path) ----------------
    # DistMult energies are linear in each entity code given the other two
    # factors: energy(e1) = e1 . (r * e2), energy(e2) = (e1 * r) . e2.
    # The factors are shared by every corruption of the same positive, so
    # the negative-sampling loss can gather ONE factor per positive instead
    # of re-gathering (e1, r, e2) for every tiled negative.
    factorizable = True

    def subject_factor(self, params, r, e2):
        """q with energy(candidate_subject e) = e . q."""
        return r * e2

    def object_factor(self, params, e1, r):
        return e1 * r

    def factored_energy(self, params, entity_codes, factor):
        return jnp.sum(entity_codes * factor, axis=-1, dtype=jnp.float32)

    def regularization(self, params, e1, r, e2, mask=None,
                       axis_name=None):
        """reg_param * (mean e1^2 + mean r^2 + mean e2^2) over the batch
        codes (``bilinear_diag.py:63-69``)."""
        m = None if mask is None else mask[:, None] * jnp.ones_like(e1)
        reg = (masked_mean(e1 ** 2, m, axis_name)
               + masked_mean(r ** 2, m, axis_name)
               + masked_mean(e2 ** 2, m, axis_name))
        return self.regularization_parameter * reg


class Complex(BilinearDiag):
    """ComplEx decoder (``decoders/complex.py``); codes are [re | im]."""

    name = "complex"

    def energies(self, params, e1, r, e2):
        return sddmm.complex_energies(e1, r, e2)

    # ComplEx is also bilinear: energy(e1) = e1 . q with
    # q = [rr*e2r + ri*e2i | rr*e2i - ri*e2r] and
    # energy(e2) = q' . e2 with q' = [e1r*rr - e1i*ri | e1i*rr + e1r*ri].
    def subject_factor(self, params, r, e2):
        d = r.shape[-1] // 2
        rr, ri = r[..., :d], r[..., d:]
        e2r, e2i = e2[..., :d], e2[..., d:]
        return jnp.concatenate([rr * e2r + ri * e2i,
                                rr * e2i - ri * e2r], axis=-1)

    def object_factor(self, params, e1, r):
        d = r.shape[-1] // 2
        rr, ri = r[..., :d], r[..., d:]
        e1r, e1i = e1[..., :d], e1[..., d:]
        return jnp.concatenate([e1r * rr - e1i * ri,
                                e1i * rr + e1r * ri], axis=-1)

    def all_subject_energies(self, params, all_codes, r, e2):
        return sddmm.complex_all_subjects(all_codes, r, e2)

    def all_object_energies(self, params, all_codes, e1, r):
        return sddmm.complex_all_objects(all_codes, e1, r)


class NonlinearTransform:
    """1-hidden-layer MLP decoder (``decoders/nonlinear_transform.py``).

    The reference's all-entity scoring for this decoder is knowingly broken
    (falls back to the DistMult formula with a printed warning,
    ``nonlinear_transform.py:73-78``). We implement the *correct* all-entity
    scoring by broadcasting the candidate term through the hidden layer.
    """

    name = "nonlinear-transform"
    factorizable = False  # MLP energies are not bilinear in the codes

    def __init__(self, dimension: int, embedding_width: int,
                 regularization_parameter: float):
        self.dimension = dimension
        self.embedding_width = embedding_width
        self.regularization_parameter = regularization_parameter

    def init(self, key) -> Dict:
        k = jax.random.split(key, 4)
        std_in = math.sqrt(1.0 / (self.embedding_width + self.dimension))
        std_out = math.sqrt(1.0 / (self.dimension + 1))
        shape = (self.embedding_width, self.dimension)
        return {
            "W_e1": std_in * jax.random.normal(k[0], shape, dtype=jnp.float32),
            "W_r": std_in * jax.random.normal(k[1], shape, dtype=jnp.float32),
            "W_e2": std_in * jax.random.normal(k[2], shape, dtype=jnp.float32),
            "b_pre": jnp.zeros((self.dimension,), dtype=jnp.float32),
            "W_transform": std_out * jax.random.normal(
                k[3], (self.dimension, 1), dtype=jnp.float32),
            "b_post": jnp.zeros((1,), dtype=jnp.float32),
        }

    def energies(self, params, e1, r, e2):
        hidden = (jnp.dot(e1, params["W_e1"], preferred_element_type=jnp.float32)
                  + jnp.dot(r, params["W_r"], preferred_element_type=jnp.float32)
                  + jnp.dot(e2, params["W_e2"], preferred_element_type=jnp.float32)
                  + params["b_pre"])
        out = jnp.dot(jax.nn.relu(hidden), params["W_transform"],
                      preferred_element_type=jnp.float32) + params["b_post"]
        return jnp.squeeze(out, axis=-1)

    def all_subject_energies(self, params, all_codes, r, e2):
        fixed = (jnp.dot(r, params["W_r"], preferred_element_type=jnp.float32)
                 + jnp.dot(e2, params["W_e2"], preferred_element_type=jnp.float32)
                 + params["b_pre"])                                # [N, D]
        cand = jnp.dot(all_codes, params["W_e1"],
                       preferred_element_type=jnp.float32)         # [V, D]
        return self._broadcast_score(params, fixed, cand)

    def all_object_energies(self, params, all_codes, e1, r):
        fixed = (jnp.dot(e1, params["W_e1"], preferred_element_type=jnp.float32)
                 + jnp.dot(r, params["W_r"], preferred_element_type=jnp.float32)
                 + params["b_pre"])
        cand = jnp.dot(all_codes, params["W_e2"],
                       preferred_element_type=jnp.float32)
        return self._broadcast_score(params, fixed, cand)

    def _broadcast_score(self, params, fixed, cand):
        def per_row(f):
            hidden = jax.nn.relu(f[None, :] + cand)                # [V, D]
            out = jnp.dot(hidden, params["W_transform"],
                          preferred_element_type=jnp.float32) + params["b_post"]
            return jnp.squeeze(out, axis=-1)                       # [V]
        return jax.lax.map(per_row, fixed)                         # [N, V]

    def regularization(self, params, e1, r, e2, mask=None,
                       axis_name=None):
        m = None if mask is None else mask[:, None] * jnp.ones_like(e1)
        reg = (masked_mean(e1 ** 2, m, axis_name)
               + masked_mean(r ** 2, m, axis_name)
               + masked_mean(e2 ** 2, m, axis_name))
        return self.regularization_parameter * reg


def build_decoder(name: str, *, code_dimension: int,
                  regularization_parameter: float,
                  decoder_dimension: int = 500,
                  embedding_width: int = 500):
    """Decoder factory (``model_builder.build_decoder``)."""
    if name == "bilinear-diag":
        return BilinearDiag(code_dimension, regularization_parameter)
    if name == "complex":
        return Complex(code_dimension, regularization_parameter)
    if name == "nonlinear-transform":
        return NonlinearTransform(decoder_dimension, embedding_width,
                                  regularization_parameter)
    raise ValueError(f"unknown decoder {name!r}")
