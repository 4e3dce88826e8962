"""SDDMM-style per-triple scoring contractions.

Replaces the reference's gather-multiply-reduce scoring
(``bilinear_diag.py:27-61``, ``complex.py:31-106``) with fused einsums; the
all-entity variants are plain [N, d] x [d, V] GEMMs that ride the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp


def distmult_energies(e1, r, e2):
    """DistMult triple energies: sum_d e1 * r * e2 (``bilinear_diag.py:30``).

    Accumulates in float32 regardless of the stream dtype, so bf16
    decoder streams (DecoderConfig.stream_precision) keep f32 logits."""
    return jnp.sum(e1 * r * e2, axis=-1, dtype=jnp.float32)


def distmult_all_subjects(all_codes, r, e2):
    """[N, V] energies against every candidate subject
    (``bilinear_diag.py:55-57``): (all_codes @ (r * e2)^T)^T."""
    return jnp.dot(r * e2, all_codes.T, preferred_element_type=jnp.float32)


def distmult_all_objects(all_codes, e1, r):
    """[N, V] energies against every candidate object
    (``bilinear_diag.py:59-61``)."""
    return jnp.dot(e1 * r, all_codes.T, preferred_element_type=jnp.float32)


def _split(x):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


def complex_energies(e1, r, e2):
    """ComplEx energies Re<e1, r, conj(e2)> via the 4-term real expansion
    (``complex.py:38-41``)."""
    e1r, e1i = _split(e1)
    e2r, e2i = _split(e2)
    rr, ri = _split(r)
    f32 = jnp.float32
    return (jnp.sum(e1r * rr * e2r, -1, dtype=f32)
            + jnp.sum(e1i * rr * e2i, -1, dtype=f32)
            + jnp.sum(e1r * ri * e2i, -1, dtype=f32)
            - jnp.sum(e1i * ri * e2r, -1, dtype=f32))


def complex_all_subjects(all_codes, r, e2):
    """[N, V] ComplEx energies against all subjects via 4 GEMMs
    (``complex.py:77-93``)."""
    ar, ai = _split(all_codes)
    e2r, e2i = _split(e2)
    rr, ri = _split(r)
    return (jnp.dot(rr * e2r, ar.T, preferred_element_type=jnp.float32)
            + jnp.dot(rr * e2i, ai.T, preferred_element_type=jnp.float32)
            + jnp.dot(ri * e2i, ar.T, preferred_element_type=jnp.float32)
            - jnp.dot(ri * e2r, ai.T, preferred_element_type=jnp.float32))


def complex_all_objects(all_codes, e1, r):
    """[N, V] ComplEx energies against all objects via 4 GEMMs
    (``complex.py:95-106``)."""
    ar, ai = _split(all_codes)
    e1r, e1i = _split(e1)
    rr, ri = _split(r)
    return (jnp.dot(e1r * rr, ar.T, preferred_element_type=jnp.float32)
            + jnp.dot(e1i * rr, ai.T, preferred_element_type=jnp.float32)
            + jnp.dot(e1r * ri, ai.T, preferred_element_type=jnp.float32)
            - jnp.dot(e1i * ri, ar.T, preferred_element_type=jnp.float32))
