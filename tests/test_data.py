"""Data-layer tests over synthetic ShapeNet / S3DIS fixtures."""

import numpy as np
import pytest

from weaksuppointcloudseg_tpu.data import shapenet, s3dis, sampling


@pytest.fixture(scope="module")
def shapenet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shapenet")
    shapenet.write_synthetic(str(d), num_points=64, train_samples=20, val_samples=6,
                             test_samples=3)
    return str(d)


@pytest.fixture(scope="module")
def s3dis_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("s3dis")
    s3dis.write_synthetic(str(d), num_points=64)
    return str(d)


class TestShapeNet:
    def test_meta_maps(self, shapenet_dir):
        meta = shapenet.ShapeNetMeta.load(shapenet_dir + "/hdf5_data")
        assert meta.num_categories == 4
        assert meta.num_part_cats == 12
        # each category owns a disjoint contiguous set of part ids
        seen = set()
        for c in range(meta.num_categories):
            oids = meta.iou_oids(c)
            assert len(oids) == 3
            assert not (set(oids) & seen)
            seen |= set(oids)

    def test_split_shapes(self, shapenet_dir):
        ds = shapenet.ShapeNetDataset(shapenet_dir)
        data, label, seg = ds.split("train")
        assert data.shape == (20, 64, 3)
        assert label.shape == (20,)
        assert seg.shape == (20, 64)
        assert ds.num_samples("val") == 6

    def test_batches_fixed_shape_and_coverage(self, shapenet_dir):
        ds = shapenet.ShapeNetDataset(shapenet_dir)
        seen = []
        for b in ds.batches("train", 6):
            assert b.data.shape == (6, 64, 3)
            seen += list(b.sample_ids[: b.valid])
        assert sorted(seen) == list(range(20))
        # drop_last drops the ragged tail
        n = sum(b.valid for b in ds.batches("train", 6, drop_last=True))
        assert n == 18

    def test_weak_onehot_matches_unique(self, shapenet_dir, rng):
        seg = rng.integers(0, 12, (5, 64))
        got = shapenet.weak_category_onehot(seg, 12)
        for i in range(5):
            want = np.zeros(12)
            want[np.unique(seg[i])] = 1
            np.testing.assert_array_equal(got[i], want)

    def test_testset_loading(self, shapenet_dir):
        ts = shapenet.ShapeNetTestSet(shapenet_dir)
        assert len(ts) == 3
        pts, seg, cat = ts[0]
        assert pts.shape[0] == seg.shape[0]
        # normalized to unit sphere
        assert np.abs(np.linalg.norm(pts, axis=1).max() - 1.0) < 1e-5
        # seg ids live inside the category's part-id range
        oids = ts.meta.iou_oids(cat)
        assert set(np.unique(seg)) <= set(oids)

    def test_resample_to_fixed(self, rng):
        # up-sample keeps all original points first (duplicate-then-slice)
        idx = shapenet.resample_to_fixed(10, 16, rng)
        assert len(idx) == 16 and sorted(set(idx[:10])) == list(range(10))
        # down-sample (quirk Q3 fix: reference would crash here)
        idx = shapenet.resample_to_fixed(20, 16, rng)
        assert len(idx) == 16 and len(set(idx)) == 16
        idx = shapenet.resample_to_fixed(16, 16, rng)
        np.testing.assert_array_equal(idx, np.arange(16))


class TestS3DIS:
    def test_area_split(self, s3dis_dir):
        ds = s3dis.S3DISDataset(s3dis_dir)
        train_idx, test_idx = ds.split_indices(5)
        assert len(train_idx) + len(test_idx) == len(ds.room_filelist)
        assert len(test_idx) > 0
        rooms = np.asarray(ds.room_filelist)
        assert all("Area_5" in r for r in rooms[test_idx])
        assert all("Area_5" not in r for r in rooms[train_idx])

    def test_batches(self, s3dis_dir):
        ds = s3dis.S3DISDataset(s3dis_dir)
        train_idx, _ = ds.split_indices(5)
        for b in ds.batches(train_idx, 3):
            assert b.data.shape == (3, 64, 9)
            assert b.seg.shape == (3, 64)

    def test_room_to_blocks_semantics(self, rng):
        # one dense 1m x 1m corner + sparse far corner that gets filtered
        n = 500
        xyz = rng.uniform(0, 1.0, (n, 3))
        sparse = rng.uniform([3, 3, 0], [4, 4, 1], (20, 3))
        pts = np.concatenate([xyz, sparse])
        rgb = rng.uniform(0, 255, (len(pts), 3))
        lab = rng.integers(0, 13, len(pts))
        room = np.concatenate([pts, rgb, lab[:, None]], 1)
        blocks, labels = s3dis.room_to_blocks(room, 64, min_points=100, rng=rng)
        assert blocks.shape[1:] == (64, 9)
        assert labels.shape[1:] == (64,)
        # 9-channel invariants: rgb in [0,1], normalized coords in [0,1],
        # centered xy within +-block/2 of zero
        assert blocks[..., 3:6].min() >= 0 and blocks[..., 3:6].max() <= 1
        assert blocks[..., 6:9].min() >= 0 and blocks[..., 6:9].max() <= 1 + 1e-6
        assert np.abs(blocks[..., 0:2]).max() <= 1.0 + 1e-6

    def test_test_rooms(self, s3dis_dir):
        rooms = s3dis.S3DISTestRooms(s3dis_dir, "area5", num_point=64)
        assert len(rooms) == 2
        blocks, labels, path, room_max = rooms.load_room(0)
        assert blocks.shape[0] == labels.shape[0] > 0
        assert blocks.shape[1:] == (64, 9)
        # room_max is the channel-6:9 normalization scale: rescaling those
        # channels must land inside the room's bounding box
        assert room_max.shape == (3,) and (room_max > 0).all()
        global_xyz = blocks[..., 6:9] * room_max
        assert global_xyz.max() <= room_max.max() + 1e-4


class TestSampling:
    def test_mask_roundtrip(self, rng):
        idx = sampling.generate_sample_index(10, 64, 0.1, seed=1)
        assert idx.shape == (10, 6)
        mask = sampling.indices_to_mask(idx, [2, 5], 64)
        assert mask.shape == (2, 64)
        np.testing.assert_array_equal(np.sort(np.nonzero(mask[0])[0]), np.sort(idx[2]))

    def test_one_point_per_class(self, rng):
        seg = rng.integers(0, 5, (4, 64))
        lst = sampling.generate_one_point_per_class(seg, seed=0)
        for s, idx in zip(seg, lst):
            assert len(idx) == len(np.unique(s))
            assert len(np.unique(s[idx])) == len(idx)


class TestSamplingExport:
    def test_mat_roundtrip_rectangular(self, tmp_path, rng):
        from weaksuppointcloudseg_tpu.data import sampling
        idx = sampling.generate_sample_index(6, 64, 0.1, seed=2)
        path = str(tmp_path / "SampIndex_m-0.100.mat")
        sampling.save_sample_index_mat(path, idx)
        back = sampling.load_sample_index_mat(path, 0.1)
        np.testing.assert_array_equal(np.asarray(back), idx)

    def test_mat_roundtrip_ragged(self, tmp_path, rng):
        from weaksuppointcloudseg_tpu.data import sampling
        seg = rng.integers(0, 5, (4, 64))
        lst = sampling.generate_one_point_per_class(seg, seed=0)
        path = str(tmp_path / "SampIndex_m-0.000.mat")
        sampling.save_sample_index_mat(path, lst)
        back = sampling.load_sample_index_mat(path, 0.0)
        assert len(back) == len(lst)
        for a, b in zip(back, lst):
            np.testing.assert_array_equal(np.asarray(a).reshape(-1), b)


class TestRandomSampleBlocks:
    def test_random_sample_mode(self, rng):
        from weaksuppointcloudseg_tpu.data import s3dis
        pts = rng.uniform(0, 2.0, (800, 3))
        rgb = rng.uniform(0, 255, (800, 3))
        lab = rng.integers(0, 13, 800)
        room = np.concatenate([pts, rgb, lab[:, None]], 1)
        blocks, labels = s3dis.room_to_blocks(
            room, 64, min_points=20, random_sample=True, sample_num=10, rng=rng)
        assert blocks.shape[1:] == (64, 9)
        assert 0 < blocks.shape[0] <= 10
