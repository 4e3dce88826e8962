"""Oracle tests for the v2 fused staircase kernel (ops/staircase2.py).

All on CPU in Pallas interpreter mode; numerics compared against plain
segment-sum / einsum oracles and against jax autodiff of the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationprediction_tpu.ops import relblock
from relationprediction_tpu.ops import staircase2 as s2


def random_edges(rng, e, v, r):
    senders = rng.integers(0, v, e).astype(np.int32)
    relations = rng.integers(0, r, e).astype(np.int32)
    receivers = rng.integers(0, v, e).astype(np.int32)
    weights = (rng.random(e) * 0.9 + 0.1).astype(np.float32)
    # sprinkle padding edges (weight 0)
    pad = rng.random(e) < 0.1
    weights[pad] = 0.0
    return senders, relations, receivers, weights


def oracle_direction(feats, msgs_fn, senders, relations, receivers,
                     weights, v):
    msgs = msgs_fn(feats[senders], relations)
    out = np.zeros((v, msgs.shape[1]), np.float32)
    for i in range(len(senders)):
        out[receivers[i]] += weights[i] * msgs[i]
    return out


@pytest.mark.parametrize("rb,chunk,k,grp", [(128, 256, 2, 8),
                                            (64, 128, None, 8),
                                            (128, 512, 1, 16)])
def test_scatter2_matches_segment_sum(rb, chunk, k, grp):
    rng = np.random.default_rng(0)
    v, r, e, d = 300, 11, 1000, 32
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    layout = s2.build_staircase2_layout(senders, relations, receivers,
                                        weights, v, rb=rb, chunk=chunk,
                                        k=k, group=grp)
    msgs = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    got = s2.scatter2(msgs, layout, v, interpret=True)
    want = np.zeros((v, d), np.float32)
    m = np.asarray(msgs)
    for i in range(e):
        if weights[i] > 0:
            want[receivers[i]] += weights[i] * m[i]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-5)


def test_scatter2_pad_rows_static_shape():
    """pad_rows_to gives identical results with a larger static grid."""
    rng = np.random.default_rng(1)
    v, r, e, d = 200, 5, 500, 16
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    base = s2.build_staircase2_layout(senders, relations, receivers,
                                      weights, v, rb=64, chunk=128, k=2)
    padded = s2.build_staircase2_layout(senders, relations, receivers,
                                        weights, v, rb=64, chunk=128, k=2,
                                        pad_rows_to=base.n_rows + 3)
    assert padded.n_rows == base.n_rows + 3
    msgs = jnp.asarray(rng.standard_normal((e, d)).astype(np.float32))
    a = s2.scatter2(msgs, base, v, interpret=True)
    b = s2.scatter2(msgs, padded, v, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_block_direction_forward():
    rng = np.random.default_rng(2)
    v, r, e = 150, 7, 600
    nb, dr = 8, 4
    d = nb * dr
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    pair = s2.build_staircase2_pair(senders, relations, receivers, weights,
                                    v, direction="forward", rb=64,
                                    chunk=128, k=2, group=8)
    feats = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((r, nb, dr, dr)).astype(np.float32))

    got = s2.block_direction(feats, blocks, pair, nb, v, True, None)

    def msgs_fn(x_e, rel_e):
        w = np.asarray(blocks)[rel_e]
        xr = np.asarray(x_e).reshape(-1, nb, dr)
        return np.einsum("ebij,ebj->ebi", w, xr).reshape(-1, d)

    want = oracle_direction(np.asarray(feats), msgs_fn, senders, relations,
                            receivers, weights, v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_block_direction_backward_direction():
    """direction='backward' swaps source/target roles."""
    rng = np.random.default_rng(3)
    v, r, e = 100, 5, 400
    nb, dr = 4, 4
    d = nb * dr
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    pair = s2.build_staircase2_pair(senders, relations, receivers, weights,
                                    v, direction="backward", rb=64,
                                    chunk=128, k=1, group=8)
    feats = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((r, nb, dr, dr)).astype(np.float32))
    got = s2.block_direction(feats, blocks, pair, nb, v, True, None)

    def msgs_fn(x_e, rel_e):
        w = np.asarray(blocks)[rel_e]
        xr = np.asarray(x_e).reshape(-1, nb, dr)
        return np.einsum("ebij,ebj->ebi", w, xr).reshape(-1, d)

    # backward: gather receivers, scatter to senders
    want = oracle_direction(np.asarray(feats), msgs_fn, receivers,
                            relations, senders, weights, v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_block_direction_grad_matches_autodiff():
    rng = np.random.default_rng(4)
    v, r, e = 80, 4, 300
    nb, dr = 4, 2
    d = nb * dr
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    pair = s2.build_staircase2_pair(senders, relations, receivers, weights,
                                    v, direction="forward", rb=32,
                                    chunk=64, k=1, group=8)
    feats = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    blocks = jnp.asarray(
        rng.standard_normal((r, nb, dr, dr)).astype(np.float32))
    probe = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))

    def fused_loss(f, w):
        out = s2.block_direction(f, w, pair, nb, v, True, None)
        return jnp.sum(out * probe)

    def oracle_loss(f, w):
        msgs = relblock.block_diag_messages(f, w, jnp.asarray(senders),
                                            jnp.asarray(relations), nb)
        out = jax.ops.segment_sum(
            msgs * jnp.asarray(weights)[:, None], jnp.asarray(receivers),
            num_segments=v)
        return jnp.sum(out * probe)

    gf1, gw1 = jax.grad(fused_loss, argnums=(0, 1))(feats, blocks)
    gf2, gw2 = jax.grad(oracle_loss, argnums=(0, 1))(feats, blocks)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=2e-4, atol=2e-4)


def test_basis_direction_forward_and_grad():
    rng = np.random.default_rng(5)
    v, r, e = 90, 6, 350
    b, d_in, d_out = 3, 12, 16
    senders, relations, receivers, weights = random_edges(rng, e, v, r)
    pair = s2.build_staircase2_pair(senders, relations, receivers, weights,
                                    v, direction="forward", rb=32,
                                    chunk=64, k=1, group=8)
    feats = jnp.asarray(rng.standard_normal((v, d_in)).astype(np.float32))
    w_flat = jnp.asarray(
        rng.standard_normal((d_in, b * d_out)).astype(np.float32))
    coef = jnp.asarray(rng.standard_normal((r, b)).astype(np.float32))
    probe = jnp.asarray(rng.standard_normal((v, d_out)).astype(np.float32))

    def fused_loss(f, w, c):
        out = s2.basis_direction(f, w, c, pair, b, v, True, None)
        return jnp.sum(out * probe)

    def oracle_loss(f, w, c):
        proj = relblock.basis_vertex_projection(f, w, b)
        msgs = relblock.basis_messages(proj, c, jnp.asarray(senders),
                                       jnp.asarray(relations))
        out = jax.ops.segment_sum(
            msgs * jnp.asarray(weights)[:, None], jnp.asarray(receivers),
            num_segments=v)
        return jnp.sum(out * probe)

    got = s2.basis_direction(feats, w_flat, coef, pair, b, v, True, None)
    proj = relblock.basis_vertex_projection(feats, w_flat, b)
    msgs = relblock.basis_messages(proj, coef, jnp.asarray(senders),
                                   jnp.asarray(relations))
    want = jax.ops.segment_sum(
        msgs * jnp.asarray(weights)[:, None], jnp.asarray(receivers),
        num_segments=v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    g1 = jax.grad(fused_loss, argnums=(0, 1, 2))(feats, w_flat, coef)
    g2 = jax.grad(oracle_loss, argnums=(0, 1, 2))(feats, w_flat, coef)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_jmajor_roundtrip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((10, 20)).astype(np.float32))
    y = s2.from_jmajor(s2.to_jmajor(x, 5), 5)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_empty_graph_layout():
    layout = s2.build_staircase2_layout(
        np.zeros(4, np.int32), np.zeros(4, np.int32),
        np.zeros(4, np.int32), np.zeros(4, np.float32), 50,
        rb=32, chunk=64, k=1)
    msgs = jnp.zeros((4, 8), jnp.float32)
    out = s2.scatter2(msgs, layout, 50, interpret=True)
    assert out.shape == (50, 8)
    np.testing.assert_allclose(np.asarray(out), 0.0)
