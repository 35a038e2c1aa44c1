"""Alternate losses (Util/Loss.py parity) + point-cloud IO utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weaksuppointcloudseg_tpu.losses import alternates as A
from weaksuppointcloudseg_tpu.utils import pointcloud_io as pio


class TestAlternateLosses:
    @pytest.fixture
    def data(self, rng):
        logits = jnp.asarray(rng.standard_normal((2, 32, 5)), jnp.float32)
        bag = jnp.asarray(rng.integers(0, 2, (2, 5)), jnp.float32)
        targets = jnp.asarray(rng.integers(0, 2, (2, 32, 5)), jnp.float32)
        return logits, bag, targets

    def test_focal_loss_matches_formula(self, data):
        logits, _, targets = data
        out = np.asarray(A.focal_loss(logits, targets))
        p = 1 / (1 + np.exp(-np.asarray(logits)))
        z = np.asarray(targets)
        pos = np.where(z > 0, z - p, 0.0)
        neg = np.where(z > 0, 0.0, p)
        want = (-0.25 * pos**2 * np.log(np.clip(p, 1e-8, 1))
                - 0.75 * neg**2 * np.log(np.clip(1 - p, 1e-8, 1)))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_class_weighted_ce_positive(self, data):
        logits, _, targets = data
        out = np.asarray(A.class_weighted_ce(logits, targets, 2.0, 1.0))
        assert (out >= 0).all()

    def test_self_entropy_sign_convention(self):
        # reference returns sum(p log p) — negative for uncertain, ~0 for
        # confident predictions
        confident = jnp.asarray([[[100.0, -100.0, -100.0]]])
        uniform = jnp.zeros((1, 1, 3))
        assert float(A.self_entropy(confident)[0, 0]) == pytest.approx(0.0, abs=1e-3)
        assert float(A.self_entropy(uniform)[0, 0]) == pytest.approx(
            np.log(1 / 3), rel=1e-3)

    def test_overwhelm_zero_when_satisfied(self):
        # class 0 present and clearly dominant at point 0 -> zero loss
        logits = jnp.asarray([[[10.0, 0.0], [0.0, 10.0]]])  # [1, 2, 2]
        bag = jnp.asarray([[1.0, 1.0]])
        loss, per_class = A.overwhelm_loss(logits, bag)
        assert float(loss) == pytest.approx(0.0)

    def test_overwhelm_positive_when_violated(self):
        # class 1 present but never dominant
        logits = jnp.asarray([[[10.0, 0.0], [10.0, 5.0]]])
        bag = jnp.asarray([[1.0, 1.0]])
        loss, _ = A.overwhelm_loss(logits, bag)
        assert float(loss) > 0

    def test_overwhelm_v2_pos_neg_parts(self, data):
        logits, bag, _ = data
        loss, pos, neg = A.overwhelm_loss_v2(logits, bag)
        assert np.isfinite(float(loss))
        assert (np.asarray(pos) >= 0).all() and (np.asarray(neg) >= 0).all()
        # pos only on present classes, neg only on absent
        assert (np.asarray(pos)[np.asarray(bag) == 0] == 0).all()
        assert (np.asarray(neg)[np.asarray(bag) == 1] == 0).all()

    def test_overwhelm_v1_runs(self, data):
        logits, bag, _ = data
        assert np.isfinite(float(A.overwhelm_loss_v1(logits, bag)))


class TestPointCloudIO:
    def test_ply_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.standard_normal((20, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (20, 3)).astype(np.uint8)
        path = str(tmp_path / "a.ply")
        pio.write_ply(path, pts, rgb)
        pts2, rgb2 = pio.read_ply(path)
        np.testing.assert_allclose(pts2, pts, atol=1e-5)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_ply_roundtrip_binary(self, tmp_path, rng):
        pts = rng.standard_normal((15, 3)).astype(np.float32)
        path = str(tmp_path / "b.ply")
        pio.write_ply(path, pts, binary=True)
        pts2, rgb2 = pio.read_ply(path)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        assert rgb2 is None

    def test_room_obj_export(self, tmp_path, rng):
        room = np.concatenate([
            rng.uniform(0, 2, (30, 3)),
            rng.uniform(0, 255, (30, 3)),
            rng.integers(0, 13, (30, 1)),
        ], axis=1)
        path = str(tmp_path / "room.obj")
        pio.room_to_obj(room, path)
        lines = open(path).read().splitlines()
        assert len(lines) == 30 and all(l.startswith("v ") for l in lines)

    def test_point_cloud_to_image(self, rng):
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        img = pio.point_cloud_to_image(pts, resolution=64)
        assert img.shape == (64, 64)
        assert 0 <= img.min() and img.max() == pytest.approx(1.0)


class TestRandomBaseline:
    def test_nearest_label_propagate(self, rng):
        from weaksuppointcloudseg_tpu.cli.random_baseline import (
            nearest_label_propagate,
        )

        pts = rng.standard_normal((64, 3)).astype(np.float32)
        seg = rng.integers(0, 4, 64)
        labelled = np.arange(0, 64, 4)
        pred = nearest_label_propagate(pts, labelled, seg)
        # labelled points keep their own label (distance 0)
        np.testing.assert_array_equal(pred[labelled], seg[labelled])
