"""Fused factored-negative-energy op: parity of values and gradients
against the direct (autodiff) formulation, at a scale that takes the
fused windowed-backward path."""
import jax
import jax.numpy as jnp
import numpy as np

from relationprediction_tpu.ops import neg_energy as ne


def _setup(seed=0, n=1200, k=10, v=2048, d=64):
    rng = np.random.default_rng(seed)
    codes = rng.standard_normal((v, d)).astype(np.float32)
    q_subj = rng.standard_normal((n, d)).astype(np.float32)
    q_obj = rng.standard_normal((n, d)).astype(np.float32)
    neg_values = rng.integers(0, v, (n, k)).astype(np.int32)
    corrupt_object = rng.integers(0, 2, (n, k)).astype(bool)
    return codes, q_subj, q_obj, neg_values, corrupt_object


def _loss(fn, codes, q_subj, q_obj, nv, co, wE, wS):
    energy, ev_sq = fn(codes, q_subj, q_obj, nv, co)
    return (jnp.sum(energy.astype(jnp.float32) * wE)
            + jnp.sum(ev_sq.astype(jnp.float32) * wS))


def test_fused_matches_direct():
    codes, q_subj, q_obj, nv, co = _setup()
    n, k = nv.shape
    assert n * k >= 4 * ne._CHUNK and codes.shape[0] >= 2 * ne._WINDOW
    codes16 = jnp.asarray(codes).astype(jnp.bfloat16)
    qs16 = jnp.asarray(q_subj).astype(jnp.bfloat16)
    qo16 = jnp.asarray(q_obj).astype(jnp.bfloat16)
    rng = np.random.default_rng(1)
    wE = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    wS = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    eF, sF = ne._fused(codes16, qs16, qo16, jnp.asarray(nv),
                       jnp.asarray(co))
    eD, sD = ne._direct(codes16, qs16, qo16, jnp.asarray(nv),
                        jnp.asarray(co))
    np.testing.assert_allclose(np.asarray(eF), np.asarray(eD),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sF), np.asarray(sD),
                               rtol=1e-5, atol=1e-5)

    gF = jax.grad(lambda c, a, b: _loss(ne._fused, c, a, b,
                                        jnp.asarray(nv), jnp.asarray(co),
                                        wE, wS),
                  argnums=(0, 1, 2))(codes16, qs16, qo16)
    gD = jax.grad(lambda c, a, b: _loss(ne._direct, c, a, b,
                                        jnp.asarray(nv), jnp.asarray(co),
                                        wE, wS),
                  argnums=(0, 1, 2))(codes16, qs16, qo16)
    for f, d_, name, tol in [
            (gF[0], gD[0], "d_codes", 0.15),
            (gF[1], gD[1], "d_q_subj", 0.05),
            (gF[2], gD[2], "d_q_obj", 0.05)]:
        f = np.asarray(f, np.float32)
        d_ = np.asarray(d_, np.float32)
        # bf16 payload accumulation on both sides, different orders;
        # compare with a norm-relative tolerance.
        denom = max(np.abs(d_).max(), 1e-6)
        np.testing.assert_allclose(f / denom, d_ / denom, atol=tol,
                                   err_msg=name)


def test_dispatcher_uses_direct_for_f32_and_small():
    codes, q_subj, q_obj, nv, co = _setup(n=20, k=5, v=64, d=16)
    e, s = ne.factored_negative_energies(
        jnp.asarray(codes), jnp.asarray(q_subj), jnp.asarray(q_obj),
        jnp.asarray(nv), jnp.asarray(co))
    eD, sD = ne._direct(jnp.asarray(codes), jnp.asarray(q_subj),
                        jnp.asarray(q_obj), jnp.asarray(nv),
                        jnp.asarray(co))
    np.testing.assert_allclose(np.asarray(e), np.asarray(eD), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sD), rtol=1e-6)


def test_fused_grad_vs_dense_reference():
    # d_codes against a dense numpy accumulation (f32 reference).
    codes, q_subj, q_obj, nv, co = _setup(seed=2, n=1000, k=10, v=1200,
                                          d=32)
    n, k = nv.shape
    codes16 = jnp.asarray(codes).astype(jnp.bfloat16)
    qs16 = jnp.asarray(q_subj).astype(jnp.bfloat16)
    qo16 = jnp.asarray(q_obj).astype(jnp.bfloat16)
    rng = np.random.default_rng(3)
    wE = rng.standard_normal((n, k)).astype(np.float32)

    g = jax.grad(lambda c: _loss(ne._fused, c, qs16, qo16,
                                 jnp.asarray(nv), jnp.asarray(co),
                                 jnp.asarray(wE),
                                 jnp.zeros((n, k), jnp.float32)))(codes16)
    # numpy reference
    q_sel = np.where(co[..., None],
                     np.asarray(qo16, np.float32)[:, None, :],
                     np.asarray(qs16, np.float32)[:, None, :])
    d = codes.shape[1]
    ref = np.zeros((codes.shape[0], d), np.float32)
    np.add.at(ref, nv.reshape(-1),
              (wE[..., None] * q_sel).reshape(-1, d))
    g = np.asarray(g, np.float32)
    denom = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(g / denom, ref / denom, atol=0.1)


def test_single_factor_fused_matches_direct():
    rng = np.random.default_rng(7)
    n, k, v, d = 1200, 10, 2048, 64
    codes = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    nv = jnp.asarray(rng.integers(0, v, (n, k)).astype(np.int32))
    wE = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    wS = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    assert n * k >= 4 * ne._CHUNK and v >= 2 * ne._WINDOW

    def loss(fn, c, qq):
        e, s = fn(c, qq, nv)
        return jnp.sum(e * wE) + jnp.sum(s * wS)

    eF, sF = ne._single_fused(codes, q, nv)
    eD, sD = ne._single_direct(codes, q, nv)
    np.testing.assert_allclose(np.asarray(eF), np.asarray(eD), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sF), np.asarray(sD), rtol=1e-5,
                               atol=1e-5)
    gF = jax.grad(lambda c, qq: loss(ne._single_fused, c, qq),
                  argnums=(0, 1))(codes, q)
    gD = jax.grad(lambda c, qq: loss(ne._single_direct, c, qq),
                  argnums=(0, 1))(codes, q)
    for f, d_, name, tol in [(gF[0], gD[0], "d_codes", 0.15),
                             (gF[1], gD[1], "d_q", 0.05)]:
        f = np.asarray(f, np.float32)
        d_ = np.asarray(d_, np.float32)
        denom = max(np.abs(d_).max(), 1e-6)
        np.testing.assert_allclose(f / denom, d_ / denom, atol=tol,
                                   err_msg=name)
