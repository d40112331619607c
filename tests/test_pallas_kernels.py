"""Pallas fused kernels vs the plain-XLA dense formulas (interpret mode on
CPU; the same kernels compile for TPU in bench/sampling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.ops.pallas import fused


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fused, "_INTERPRET", True)


def _random_inputs(rng, b=2, n=16, c=32):
    h = rng.normal(size=(b, n, c)).astype(np.float32)
    e = rng.normal(size=(b, n, n, c)).astype(np.float32)
    mask = rng.random((b, n, n)) < 0.5
    mask &= ~np.eye(n, dtype=bool)[None]
    return jnp.asarray(h), jnp.asarray(e), jnp.asarray(mask)


class TestPairScore:
    def test_matches_dense_formula(self, rng):
        b, n, c = 2, 16, 32
        h, e, mask = _random_inputs(rng, b, n, c)
        w1 = jnp.asarray(rng.normal(size=(2 * c, 24)).astype(np.float32)) * 0.1
        b1 = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32)) * 0.1
        b2 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        w3 = jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32)) * 0.1
        b3 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))

        got = fused.pair_score_mlp(h, e, mask, w1, b1, w2, b2, w3, b3)

        prod = h[:, :, None, :] * h[:, None, :, :]
        pair = jnp.concatenate([prod, e], axis=-1)
        x = jax.nn.relu(pair @ w1 + b1)
        y = jax.nn.relu(x @ w2 + b2)
        golden = (y @ w3 + b3)[..., 0]
        golden = jnp.where(mask, golden, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=1e-4)


class TestGINEAggregate:
    def test_matches_dense_formula(self, rng):
        b, n, c = 2, 16, 32
        x, e, mask = _random_inputs(rng, b, n, c)
        got = fused.gine_aggregate(x, e, mask)
        msg = jax.nn.relu(x[:, None, :, :] + e)
        golden = jnp.einsum("bij,bijh->bih", mask.astype(jnp.float32), msg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(golden),
                                   atol=1e-4)


class TestInteractionBlockAggregate:
    def test_matches_dense_formula(self, rng):
        b, n, c, f1, f2 = 2, 16, 32, 24, 8
        _, e, mask = _random_inputs(rng, b, n, c)
        dist = jnp.asarray(
            (rng.random((b, n, n)) * 12).astype(np.float32)
        )
        h1 = jnp.asarray(rng.normal(size=(b, n, f1)).astype(np.float32))
        h2 = jnp.asarray(rng.normal(size=(b, n, f2)).astype(np.float32))

        def conv(fdim):
            return dict(
                dw1=(jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32)),
                     jnp.asarray(rng.normal(size=(32,)).astype(np.float32))),
                dw2=(jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32)) * 0.2,
                     jnp.asarray(rng.normal(size=(1,)).astype(np.float32))),
                fa=(jnp.asarray(rng.normal(size=(c, fdim)).astype(np.float32)) * 0.1,
                    jnp.asarray(rng.normal(size=(fdim,)).astype(np.float32))),
                fb=(jnp.asarray(rng.normal(size=(fdim, fdim)).astype(np.float32)) * 0.1,
                    jnp.asarray(rng.normal(size=(fdim,)).astype(np.float32))),
                beta=jnp.asarray(1.1, jnp.float32),
            )

        c1, c2 = conv(f1), conv(f2)
        cutoff = 10.0

        def w_edge(cv):
            lw = jax.nn.sigmoid(
                jax.nn.relu(dist[..., None] * cv["dw1"][0][0] + cv["dw1"][1])
                @ cv["dw2"][0] + cv["dw2"][1]
            )[..., 0]
            env = jnp.exp(-((dist - cutoff) ** 2) / (2 * cutoff**2))
            return lw * env * (dist <= cutoff) * (dist >= 0.0) * mask

        got1, got2 = fused.interaction_block_aggregate(
            e, w_edge(c1), w_edge(c2), h1, h2, c1, c2
        )

        def golden(cv, h):
            w = jax.nn.softplus(cv["beta"] * (e @ cv["fa"][0] + cv["fa"][1]))
            w = w - jnp.log(2.0)
            w = (w @ cv["fb"][0] + cv["fb"][1]) * w_edge(cv)[..., None]
            return jnp.einsum("bijf,bjf->bif", w, h)

        np.testing.assert_allclose(np.asarray(got1), np.asarray(golden(c1, h1)),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(golden(c2, h2)),
                                   atol=2e-3)


class TestStackGroup:
    def test_group_chooser_mosaic_legality(self):
        """_stack_group must return a divisor of B whose (2NB, g, P)
        we-plane block is Mosaic-legal: middle block dim divisible by 8
        or equal to the full batch (the g=4 probe failed lowering on
        exactly this)."""
        from agdiff_tpu.ops.pallas.stack_packed import _stack_group

        for b in (8, 16, 32, 48, 64, 128, 256):
            for want in (4, 8, 16, 24, 32, 48, 128):
                g = _stack_group(b, want)
                assert b % g == 0, (b, want, g)
                assert g % 8 == 0 or g == b, (b, want, g)
                assert g <= max(want, 1) or g == b, (b, want, g)
        # documented defaults: QM9 B=128 -> 16, Drugs B=48 -> 16
        assert _stack_group(128, 16) == 16
        assert _stack_group(48, 16) == 16
        # non-multiple-of-8 batches fall back to one whole-batch program
        assert _stack_group(12, 16) == 12
        assert _stack_group(4, 8) == 4
