"""SemanticKITTI raw-file reader (reference kitti_dataset.py:25-324 data
contract): golden-file parsing of the native on-disk formats + a smoke
train step fed from on-disk-format fixtures."""
import dataclasses
import os
import pickle

import numpy as np
import pytest

from apollo_vision_net_tpu.data import semantic_kitti as sk
from apollo_vision_net_tpu.data import semantic_kitti_reader as skr

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def _write_sequence(tmp_path, seq="00", n_frames=2):
    """A tiny on-disk sequence in the exact native formats."""
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "sequences" / seq
    for sub in ("velodyne", "labels", "voxels"):
        (seq_dir / sub).mkdir(parents=True, exist_ok=True)

    # calib.txt: P2 + Tr (plus distractor lines)
    P2 = np.array([[700.0, 0, 600, 45.0], [0, 700.0, 180, 0.1],
                   [0, 0, 1, 0.005]])
    Tr = np.array([[0.0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, -0.29]])
    lines = ["P0: " + " ".join("0" for _ in range(12))]
    lines.append("P2: " + " ".join(str(v) for v in P2.reshape(-1)))
    lines.append("Tr: " + " ".join(str(v) for v in Tr.reshape(-1)))
    (seq_dir / "calib.txt").write_text("\n".join(lines) + "\n")

    # poses.txt: identity then 1 m forward (cam0 z = lidar x)
    poses = [np.hstack([np.eye(3), np.zeros((3, 1))]),
             np.hstack([np.eye(3), np.array([[0.0], [0.0], [1.0]])])]
    (seq_dir / "poses.txt").write_text("\n".join(
        " ".join(str(v) for v in p.reshape(-1)) for p in poses) + "\n")

    golden = {}
    for fi in range(n_frames):
        pts = rng.uniform(-10, 10, (100, 4)).astype(np.float32)
        pts.tofile(seq_dir / "velodyne" / f"{fi:06d}.bin")
        sem = rng.choice([0, 10, 40, 48, 252], 100).astype(np.uint32)
        inst = rng.integers(0, 5, 100).astype(np.uint32)
        (sem | (inst << 16)).astype(np.uint32).tofile(
            seq_dir / "labels" / f"{fi:06d}.label")
        golden[fi] = dict(pts=pts, sem=sem.astype(np.int32),
                          inst=inst.astype(np.int32))

        # voxels: label uint16 with a few known cells, invalid bitmap
        vox = np.zeros(skr.VOXEL_SHAPE, np.uint16)
        vox[5, 7, 3] = 10      # car -> learning_map 1
        vox[100, 200, 31] = 40  # road -> 9
        vox[255, 0, 0] = 252    # moving-car -> 1
        vox.reshape(-1).tofile(seq_dir / "voxels" / f"{fi:06d}.label")
        inv = np.zeros(skr.VOXEL_SHAPE, np.uint8)
        inv[0, 0, 0] = 1
        np.packbits(inv.reshape(-1)).tofile(
            seq_dir / "voxels" / f"{fi:06d}.invalid")
        occ_bits = (vox > 0).astype(np.uint8)
        np.packbits(occ_bits.reshape(-1)).tofile(
            seq_dir / "voxels" / f"{fi:06d}.bin")
        golden[fi]["vox"] = vox
    return seq_dir, P2, Tr, golden


def test_golden_file_parsing(tmp_path):
    seq_dir, P2, Tr, golden = _write_sequence(tmp_path)

    pts = skr.read_points(str(seq_dir / "velodyne" / "000000.bin"))
    np.testing.assert_array_equal(pts, golden[0]["pts"])

    sem, inst = skr.read_point_labels(str(seq_dir / "labels" / "000000.label"))
    np.testing.assert_array_equal(sem, golden[0]["sem"])
    np.testing.assert_array_equal(inst, golden[0]["inst"])

    calib = skr.read_calib(str(seq_dir / "calib.txt"))
    np.testing.assert_allclose(calib["P2"], P2)
    np.testing.assert_allclose(calib["Tr"][:3], Tr)
    np.testing.assert_allclose(calib["Tr"][3], [0, 0, 0, 1])

    # lidar-frame poses: cam0 +1 m in z == lidar +1 m in x under this Tr
    poses = skr.read_poses(str(seq_dir / "poses.txt"), calib["Tr"])
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(poses[1][:3, 3], [1.0, 0.0, 0.0], atol=1e-9)

    vox = skr.read_voxel_label(str(seq_dir / "voxels" / "000000.label"))
    assert vox[5, 7, 3] == 10 and vox[100, 200, 31] == 40

    occ = skr.read_voxel_bitmap(str(seq_dir / "voxels" / "000000.bin"))
    assert occ[5, 7, 3] and occ[100, 200, 31] and occ[255, 0, 0]
    assert occ.sum() == 3

    inv = skr.read_voxel_bitmap(str(seq_dir / "voxels" / "000000.invalid"))
    assert inv[0, 0, 0] and inv.sum() == 1


def test_ssc_gt_and_training_labels(tmp_path):
    seq_dir, _, _, golden = _write_sequence(tmp_path, n_frames=1)
    vox = skr.read_voxel_label(str(seq_dir / "voxels" / "000000.label"))
    inv = skr.read_voxel_bitmap(str(seq_dir / "voxels" / "000000.invalid"))
    gt = skr.build_ssc_gt(vox, inv)
    # converter convention: 0=empty, learning_map ids, 255 invalid
    assert gt[5, 7, 3] == 1        # car
    assert gt[100, 200, 31] == 9   # road
    assert gt[255, 0, 0] == 1      # moving car remapped to car
    assert gt[0, 0, 0] == 255      # invalid
    assert (gt == 0).sum() == gt.size - 4

    train = sk.dense_gt_to_training_labels(gt)
    assert train.shape == (sk.VOXEL_NUM,)
    # (x,y,z) -> flat (z,y,x): idx = z*(Y*X) + y*X + x
    idx = 3 * (256 * 256) + 7 * 256 + 5
    assert train[idx] == 0  # car is class 0 after the -1 shift
    assert train[0 + 0 + 0] == 255  # invalid preserved
    empty_idx = 1  # (x=1,y=0,z=0) untouched
    assert train[empty_idx] == sk.OCCUPANCY_CLASSES


def test_converter_and_smoke_train_step(tmp_path):
    """create_data.py semantic-kitti on the fixture + one jitted train step
    consuming the produced occ GT (cropped to smoke dims)."""
    import jax
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.create_data import create_semantic_kitti

    _write_sequence(tmp_path, n_frames=1)
    out_dir = tmp_path / "out"
    create_semantic_kitti(str(tmp_path), str(out_dir), sequences=["00"])

    with open(out_dir / "semantic_kitti_infos.pkl", "rb") as f:
        infos = pickle.load(f)["infos"]
    assert len(infos) == 1
    info = infos[0]
    assert os.path.exists(info["occ_gt_path"])
    assert info["cams"]["image_2"]["lidar2img"].shape == (4, 4)

    dense = np.load(info["occ_gt_path"])
    labels = sk.dense_gt_to_training_labels(dense)

    # smoke train step on a cropped grid (z,y,x order crop)
    from apollo_vision_net_tpu.configs import bev_smoke_det_occ
    from apollo_vision_net_tpu.data.synthetic import make_batch
    from apollo_vision_net_tpu.parallel import train as train_lib
    from apollo_vision_net_tpu.parallel.mesh import shard_batch_pytree

    cfg = bev_smoke_det_occ()
    m = cfg.model
    grid = labels.reshape(sk.OCC_ZDIM, sk.OCC_YDIM, sk.OCC_XDIM)
    crop = grid[:m.occ_zdim, :m.occ_ydim, :m.occ_xdim].reshape(-1)
    crop = np.clip(crop, 0, None)
    crop[(crop >= m.occupancy_classes) & (crop != 255)] = \
        m.occupancy_classes  # fold 19-class ids into the smoke head's range
    batch = make_batch(cfg, 1, seed=0)
    batch["gt_occupancy"] = crop[None].astype(np.int32)
    batch = jax.tree.map(jnp.asarray, batch)

    state = train_lib.init_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    step = train_lib.make_jitted_train_step(mesh, cfg)
    _, losses = step(state, shard_batch_pytree(mesh, batch),
                     jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss_total"]))
    assert np.isfinite(float(losses["loss_occupancy"]))
