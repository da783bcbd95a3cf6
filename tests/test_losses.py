"""KD loss invariants (model: reference tests/test_losses.py, SURVEY.md 4.2:
scalar shape, zero-loss on identical inputs, gradient flow without NaNs,
temperature effects, weighted-sum identity, annealing waypoints, numerical
stability at extreme scores — plus the padding-mask equivalence the TPU
build needs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sskd_tpu.kd.losses import (
    combined_kd_loss,
    contrastive_loss,
    listwise_kd_loss,
    margin_mse_loss,
    temperature_at,
)


def _scores(rng, b=4, n=8):
    s = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-5, 5, (b, n)).astype(np.float32))
    return s, t


class TestMarginMSE:
    def test_scalar_nonnegative(self):
        rng = np.random.default_rng(0)
        s, t = _scores(rng)
        val = margin_mse_loss(s, t)
        assert val.shape == ()
        assert float(val) >= 0.0

    def test_zero_on_identical_margins(self):
        rng = np.random.default_rng(1)
        s, _ = _scores(rng)
        assert float(margin_mse_loss(s, s, temperature=1.0)) == pytest.approx(0.0, abs=1e-8)

    def test_shift_invariance_of_margins(self):
        # margins are relative to max, so a constant shift of student scores
        # changes nothing
        rng = np.random.default_rng(2)
        s, t = _scores(rng)
        a = float(margin_mse_loss(s, t))
        b = float(margin_mse_loss(s + 3.0, t))
        assert a == pytest.approx(b, rel=1e-6)

    def test_temperature_softens_teacher(self):
        rng = np.random.default_rng(3)
        s, t = _scores(rng)
        hot = float(margin_mse_loss(s * 0, t, temperature=1.0))
        cold = float(margin_mse_loss(s * 0, t, temperature=100.0))
        assert cold < hot  # high T flattens teacher margins


class TestListwiseKD:
    def test_zero_on_identical(self):
        rng = np.random.default_rng(4)
        s, _ = _scores(rng)
        assert float(listwise_kd_loss(s, s)) == pytest.approx(0.0, abs=1e-6)

    def test_positive_on_different(self):
        rng = np.random.default_rng(5)
        s, t = _scores(rng)
        assert float(listwise_kd_loss(s, t)) > 0.0

    def test_t_squared_scaling(self):
        # at matched distributions scaled by T, loss carries the T^2 factor
        rng = np.random.default_rng(6)
        s, t = _scores(rng)
        l1 = float(listwise_kd_loss(s, t, temperature=1.0))
        l2 = float(listwise_kd_loss(s * 2, t * 2, temperature=2.0))
        assert l2 == pytest.approx(4 * l1, rel=1e-4)


class TestContrastive:
    def test_prefers_positive_in_column_zero(self):
        good = jnp.asarray([[5.0, -5.0, -5.0]])
        bad = jnp.asarray([[-5.0, 5.0, 5.0]])
        assert float(contrastive_loss(good)) < float(contrastive_loss(bad))

    def test_tau_sharpens(self):
        s = jnp.asarray([[1.0, 0.9, 0.8]])
        soft = float(contrastive_loss(s, tau=1.0))
        sharp = float(contrastive_loss(s, tau=0.05))
        assert sharp < soft  # small tau amplifies the positive's lead

    def test_stability_extreme_scores(self):
        s = jnp.asarray([[100.0, -100.0, 50.0]])
        val = float(contrastive_loss(s, tau=0.01))
        assert np.isfinite(val)


class TestCombined:
    def test_weighted_sum_identity(self):
        rng = np.random.default_rng(7)
        s, t = _scores(rng)
        out = combined_kd_loss(s, t, temperature=2.5)
        expect = (
            0.6 * float(out["margin_mse"])
            + 0.2 * float(out["listwise_kd"])
            + 0.2 * float(out["contrastive"])
        )
        assert float(out["loss"]) == pytest.approx(expect, rel=1e-6)
        assert set(out) == {"loss", "margin_mse", "listwise_kd", "contrastive", "temperature"}

    def test_annealing_waypoints(self):
        # documented schedule 4.0 -> 3.0 -> 2.0
        # (reference: results-and-benchmarks.md:9-13)
        assert float(temperature_at(0.0)) == pytest.approx(4.0)
        assert float(temperature_at(0.5)) == pytest.approx(3.0)
        assert float(temperature_at(1.0)) == pytest.approx(2.0)
        assert float(temperature_at(1.7)) == pytest.approx(2.0)  # clipped

    def test_gradient_flow_no_nans(self):
        rng = np.random.default_rng(8)
        s, t = _scores(rng)

        def loss_fn(s):
            return combined_kd_loss(s, t, temperature=3.0)["loss"]

        g = jax.grad(loss_fn)(s)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0.0

    def test_stability_extremes(self):
        s = jnp.asarray([[100.0, -100.0, 0.0]])
        t = jnp.asarray([[-100.0, 100.0, 0.0]])
        out = combined_kd_loss(s, t, temperature=0.5, tau=0.01)
        assert np.isfinite(float(out["loss"]))


class TestMasking:
    """Padded batches must produce identical losses to unpadded ones."""

    def test_mask_equivalence_all_losses(self):
        rng = np.random.default_rng(9)
        s_small = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))
        t_small = jnp.asarray(rng.uniform(-5, 5, (3, 5)).astype(np.float32))
        pad = 4
        s_big = jnp.pad(s_small, ((0, 0), (0, pad)), constant_values=7.7)
        t_big = jnp.pad(t_small, ((0, 0), (0, pad)), constant_values=-3.3)
        mask = jnp.pad(jnp.ones_like(s_small), ((0, 0), (0, pad)))

        for fn in (
            lambda a, b, m: margin_mse_loss(a, b, m, temperature=2.0),
            lambda a, b, m: listwise_kd_loss(a, b, m, temperature=2.0),
            lambda a, b, m: contrastive_loss(a, m),
        ):
            unpadded = float(fn(s_small, t_small, None))
            padded = float(fn(s_big, t_big, mask))
            assert padded == pytest.approx(unpadded, rel=1e-5), fn

    def test_fully_padded_rows_ignored(self):
        # batch-tail padding: a row with doc_valid all-zero must not change
        # any loss value
        rng = np.random.default_rng(11)
        s = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-5, 5, (2, 4)).astype(np.float32))
        s_pad = jnp.concatenate([s, jnp.full((1, 4), 9.9)], axis=0)
        t_pad = jnp.concatenate([t, jnp.full((1, 4), -9.9)], axis=0)
        mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 1, 1], [0, 0, 0, 0]], jnp.float32)
        base = combined_kd_loss(s, t, temperature=3.0)
        padded = combined_kd_loss(s_pad, t_pad, mask, temperature=3.0)
        assert float(padded["loss"]) == pytest.approx(float(base["loss"]), rel=1e-5)

    def test_mask_gradients_zero_on_padding(self):
        rng = np.random.default_rng(10)
        s = jnp.asarray(rng.standard_normal((2, 6)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-5, 5, (2, 6)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]], jnp.float32)

        g = jax.grad(lambda x: combined_kd_loss(x, t, mask)["loss"])(s)
        g = np.asarray(g)
        assert np.allclose(g[0, 3:], 0.0, atol=1e-7)
        assert np.allclose(g[1, 4:], 0.0, atol=1e-7)


class TestInBatchNegatives:
    """loss.in_batch_negatives: the InfoNCE term may see a WIDER score
    matrix (own candidates + other queries' docs); the distillation terms
    always see the per-query candidates."""

    def test_contrastive_override_changes_only_infonce(self):
        rng = np.random.default_rng(3)
        s, t = _scores(rng, b=3, n=4)
        wide = jnp.concatenate(
            [s, jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))],
            axis=1,
        )
        wide_mask = jnp.ones_like(wide)
        base = combined_kd_loss(s, t, temperature=3.0)
        over = combined_kd_loss(
            s, t, temperature=3.0,
            contrastive_scores=wide, contrastive_mask=wide_mask,
        )
        assert float(over["margin_mse"]) == pytest.approx(
            float(base["margin_mse"]), rel=1e-6
        )
        assert float(over["listwise_kd"]) == pytest.approx(
            float(base["listwise_kd"]), rel=1e-6
        )
        assert float(over["contrastive"]) == pytest.approx(
            float(contrastive_loss(wide, wide_mask)), rel=1e-6
        )

    def test_masked_extension_is_identity(self):
        # fully masking the extension columns must reproduce the plain
        # per-query InfoNCE exactly
        rng = np.random.default_rng(4)
        s, t = _scores(rng, b=3, n=4)
        wide = jnp.concatenate([s, jnp.full((3, 8), 7.7)], axis=1)
        wide_mask = jnp.concatenate(
            [jnp.ones((3, 4)), jnp.zeros((3, 8))], axis=1
        )
        over = combined_kd_loss(
            s, t, contrastive_scores=wide, contrastive_mask=wide_mask
        )
        base = combined_kd_loss(s, t)
        assert float(over["contrastive"]) == pytest.approx(
            float(base["contrastive"]), rel=1e-6
        )

    def test_more_negatives_raise_the_bound(self):
        # adding real (unmasked) in-batch negatives can only increase the
        # InfoNCE loss: the softmax denominator grows
        rng = np.random.default_rng(5)
        s, _ = _scores(rng, b=3, n=4)
        wide = jnp.concatenate(
            [s, jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))],
            axis=1,
        )
        assert float(contrastive_loss(wide)) > float(contrastive_loss(s))
