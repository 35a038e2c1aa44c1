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


class TestGeneralPLY:
    """read_ply_full: the plyfile.py ingestion surface (arbitrary layouts,
    big-endian, list properties — reference Networks/dgcnn/utils/plyfile.py)."""

    def _mesh_arrays(self, rng):
        pts = rng.standard_normal((6, 3)).astype(np.float32)
        conf = rng.standard_normal(6).astype(np.float64)
        nverts = rng.integers(0, 256, 6).astype(np.int16)
        faces = [np.array([0, 1, 2], np.int32), np.array([1, 2, 3, 4], np.int32)]
        return pts, conf, nverts, faces

    def _write(self, path, fmt, pts, conf, nverts, faces):
        import struct as _struct

        header = (
            "ply\nformat {} 1.0\ncomment made by a test\n"
            "element vertex 6\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property double confidence\nproperty short nv\n"
            "element face 2\n"
            "property list uchar int32 vertex_indices\n"
            "end_header\n".format(fmt))
        if fmt == "ascii":
            with open(path, "w") as f:
                f.write(header)
                for i in range(6):
                    f.write("%r %r %r %r %d\n" % (
                        float(pts[i, 0]), float(pts[i, 1]), float(pts[i, 2]),
                        float(conf[i]), int(nverts[i])))
                for fc in faces:
                    f.write(str(len(fc)) + " " + " ".join(map(str, fc)) + "\n")
        else:
            bo = "<" if "little" in fmt else ">"
            with open(path, "wb") as f:
                f.write(header.encode())
                for i in range(6):
                    f.write(_struct.pack(bo + "fffdh", *pts[i], conf[i],
                                         nverts[i]))
                for fc in faces:
                    f.write(_struct.pack(bo + "B", len(fc)))
                    f.write(_struct.pack(bo + "i" * len(fc), *fc))

    @pytest.mark.parametrize(
        "fmt", ["ascii", "binary_little_endian", "binary_big_endian"])
    def test_mixed_layout_all_formats(self, tmp_path, rng, fmt):
        pts, conf, nverts, faces = self._mesh_arrays(rng)
        path = str(tmp_path / f"m_{fmt}.ply")
        self._write(path, fmt, pts, conf, nverts, faces)
        elems = pio.read_ply_full(path)
        assert set(elems) == {"vertex", "face"}
        v = elems["vertex"]
        np.testing.assert_allclose(
            np.stack([v["x"], v["y"], v["z"]], 1), pts, rtol=1e-6)
        np.testing.assert_allclose(v["confidence"], conf)
        assert v["confidence"].dtype == np.float64
        np.testing.assert_array_equal(v["nv"], nverts)
        assert v["nv"].dtype == np.int16
        got_faces = elems["face"]["vertex_indices"]
        assert len(got_faces) == 2
        for got, want in zip(got_faces, faces):
            np.testing.assert_array_equal(got, want)
        # the simple API still reads the vertex cloud of a mesh file
        pts2, rgb = pio.read_ply(path)
        np.testing.assert_allclose(pts2, pts, rtol=1e-6)
        assert rgb is None

    def test_uint8_spelling_and_extra_props(self, tmp_path):
        path = str(tmp_path / "spell.ply")
        with open(path, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float32 x\nproperty float32 y\nproperty float32 z\n"
                "property uint8 red\nproperty uint8 green\nproperty uint8 blue\n"
                "property uint8 alpha\n"
                "end_header\n"
                "0 0 0 10 20 30 255\n1 2 3 40 50 60 128\n")
        pts, rgb = pio.read_ply(path)
        np.testing.assert_allclose(pts, [[0, 0, 0], [1, 2, 3]])
        np.testing.assert_array_equal(rgb, [[10, 20, 30], [40, 50, 60]])
        assert pio.read_ply_full(path)["vertex"]["alpha"].dtype == np.uint8

    def test_rejects_non_ply(self, tmp_path):
        path = str(tmp_path / "not.ply")
        open(path, "w").write("obj\nnope\n")
        with pytest.raises(ValueError, match="magic"):
            pio.read_ply_full(path)
