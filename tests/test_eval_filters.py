"""nuScenes eval GT-filtering variants (reference nuscnes_eval.py:423-566):
visibility, annotation-token, sample-token, and camera-overlap filters."""
import numpy as np
import pytest

from apollo_vision_net_tpu.evaluation import nuscenes_det as nd

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def _gt(n, **extra):
    rec = dict(
        names=np.asarray(["car"] * n),
        translation=np.arange(n * 3, dtype=np.float64).reshape(n, 3),
        size=np.ones((n, 3)),
        yaw=np.zeros(n),
        velocity=np.zeros((n, 2)),
        attrs=np.asarray(["vehicle.parked"] * n),
        ego_translation=np.zeros(3),
    )
    rec.update(extra)
    return rec


def test_filter_by_visibility():
    g = _gt(4, visibility=np.asarray(["1", "4", "4", "2"]))
    out = nd.filter_by_visibility([g], "4")[0]
    assert len(out["names"]) == 2
    np.testing.assert_array_equal(out["translation"][:, 0], [3.0, 6.0])
    # multi-level keep
    out = nd.filter_by_visibility([g], ["1", "2"])[0]
    assert len(out["names"]) == 2
    # records without the field pass through
    out = nd.filter_by_visibility([_gt(3)], "4")[0]
    assert len(out["names"]) == 3


def test_filter_by_tokens():
    g = _gt(3, tokens=np.asarray(["a", "b", "c"]))
    out = nd.filter_by_tokens([g], {"a", "c"})[0]
    assert list(out["tokens"]) == ["a", "c"]


def test_filter_by_sample_token():
    gts = [_gt(1), _gt(2), _gt(3)]
    preds = [_gt(1), _gt(1), _gt(1)]
    g2, p2, t2 = nd.filter_by_sample_token(
        gts, preds, ["s0", "s1", "s2"], {"s1"})
    assert len(g2) == 1 and len(g2[0]["names"]) == 2
    assert t2 == ["s1"]


def test_filter_by_overlap():
    # two cameras looking +x and -x; center at x=+10 visible in cam0 only,
    # center at y=+10 visible in neither... build simple pinholes
    f, cx, cy = 100.0, 48.0, 32.0

    def cam(sign):
        P = np.array([
            [0.0, -f * sign, 0.0, 0.0],
            [0.0, 0.0, -f, 0.0],
            [sign, 0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ])
        P[0] += cx * P[2]
        P[1] += cy * P[2]
        return P

    l2i = np.stack([cam(+1), cam(-1)])
    g = _gt(3, translation_lidar=np.array([
        [10.0, 0.0, 0.0],    # ahead: cam0 only
        [-10.0, 0.0, 0.0],   # behind: cam1 only
        [0.0, 0.0, 0.0],     # at origin: depth ~0, neither
    ]))
    out = nd.filter_by_overlap([g], [l2i], (64, 96), min_cams=1)[0]
    assert len(out["names"]) == 2
    out2 = nd.filter_by_overlap([g], [l2i], (64, 96), min_cams=2)[0]
    assert len(out2["names"]) == 0


def test_evaluate_detection_with_filters():
    """Perfect predictions on visibility-4 GT only: filtered eval is
    perfect, unfiltered eval loses recall."""
    rng = np.random.default_rng(0)
    gts, preds, toks = [], [], []
    for s in range(4):
        n = 6
        t = rng.uniform(-30, 30, (n, 3))
        vis = np.asarray(["4", "4", "4", "1", "1", "1"])
        g = _gt(n, translation=t, visibility=vis)
        keep = vis == "4"
        p = dict(
            names=g["names"][keep], translation=t[keep],
            size=np.ones((keep.sum(), 3)), yaw=np.zeros(keep.sum()),
            velocity=np.zeros((keep.sum(), 2)),
            scores=np.linspace(0.9, 0.5, keep.sum()),
            attrs=np.asarray(["vehicle.parked"] * keep.sum()),
            ego_translation=np.zeros(3),
        )
        gts.append(g)
        preds.append(p)
        toks.append(f"s{s}")

    full = nd.evaluate_detection(gts, preds)
    filt = nd.evaluate_detection(gts, preds, gt_visibility="4")
    assert filt["car_AP"] > full["car_AP"]
    assert filt["car_AP"] == pytest.approx(1.0, abs=1e-6)

    sub = nd.evaluate_detection(
        gts, preds, gt_visibility="4",
        sample_tokens=toks, valid_sample_tokens={"s0", "s1"})
    assert sub["car_AP"] == pytest.approx(1.0, abs=1e-6)
