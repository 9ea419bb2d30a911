"""Evaluators on mock predictions (the reference's mock_maptrv2_output.py
strategy, SURVEY.md §4.6): perfect predictions → perfect metrics, degraded
predictions → degraded metrics."""
import numpy as np
import pytest

from apollo_vision_net_tpu.evaluation.map_eval import (
    average_precision,
    chamfer_score_matrix,
    evaluate_map,
    resample_line,
    tpfp_gen,
)
from apollo_vision_net_tpu.evaluation.nuscenes_det import evaluate_detection
from apollo_vision_net_tpu.evaluation.ssc_metrics import SSCMetrics

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


# ---------- SSC ----------

def test_ssc_perfect_prediction():
    m = SSCMetrics(n_classes=17)
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 17, 5000)
    m.add_batch(gt, gt)
    s = m.get_stats()
    assert s["miou"] > 99.9
    assert s["iou"] > 99.9


def test_ssc_all_empty_pred():
    m = SSCMetrics(n_classes=17)
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 17, 5000)
    pred = np.full_like(gt, 16)  # everything empty
    m.add_batch(pred, gt)
    s = m.get_stats()
    assert s["miou"] < 1.0
    assert s["recall"] == 0.0


# ---------- map ----------

def test_resample_preserves_endpoints():
    pts = np.array([[0, 0], [1, 0], [1, 1]], np.float32)
    r = resample_line(pts, 100)
    np.testing.assert_allclose(r[0], [0, 0], atol=1e-6)
    np.testing.assert_allclose(r[-1], [1, 1], atol=1e-6)
    # uniform arc length on a straight line
    straight = resample_line(np.array([[0, 0], [10, 0]], np.float32), 50)
    np.testing.assert_allclose(straight[:, 0], np.linspace(0, 10, 50),
                               atol=1e-5)


def test_chamfer_identity_zero():
    rng = np.random.default_rng(0)
    lines = rng.uniform(-10, 10, (3, 20, 2))
    m = chamfer_score_matrix(lines, lines)
    np.testing.assert_allclose(np.diag(m), 0.0, atol=1e-6)


def test_tpfp_basic():
    gt = np.array([[0, 0], [10, 0]], np.float64)[None].repeat(2, 0)
    gt = np.stack([np.linspace([0, 0], [10, 0], 100),
                   np.linspace([0, 5], [10, 5], 100)])
    gt_flat = gt.reshape(2, -1)
    # two preds: one on gt0, one far away
    p0 = np.concatenate([gt[0].reshape(-1), [0.9]])
    p_far = np.concatenate([(gt[0] + 50).reshape(-1), [0.8]])
    gen = np.stack([p0, p_far])
    tp, fp = tpfp_gen(gen, gt_flat, threshold=1.0)
    assert tp.tolist() == [1.0, 0.0]
    assert fp.tolist() == [0.0, 1.0]


def test_map_eval_perfect():
    rng = np.random.default_rng(2)
    results, anns = [], []
    for _ in range(3):
        vecs = [np.cumsum(rng.uniform(-1, 1, (20, 2)), 0) * 3 for _ in range(4)]
        labels = rng.integers(0, 3, 4)
        anns.append({"vectors": vecs, "labels": labels})
        results.append({
            "vectors": np.stack(vecs),
            "scores": np.full(4, 0.9),
            "labels": labels,
        })
    s = evaluate_map(results, anns)
    assert s["NuscMap_chamfer/mAP"] > 0.99, s


def test_map_eval_garbage_is_zero():
    rng = np.random.default_rng(3)
    anns = [{"vectors": [np.linspace([0, 0], [5, 0], 20)],
             "labels": np.array([0])}]
    results = [{
        "vectors": rng.uniform(40, 50, (2, 20, 2)),
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([0, 0]),
    }]
    s = evaluate_map(results, anns)
    assert s["NuscMap_chamfer/mAP"] < 1e-6


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec) - 1.0) < 1e-6


# ---------- nuScenes det ----------

def _det_sample(names, centers, rng, score=None):
    n = len(names)
    d = dict(
        names=np.asarray(names),
        translation=np.asarray(centers, np.float64),
        size=np.abs(rng.normal(2, 0.5, (n, 3))) + 0.5,
        yaw=rng.uniform(-np.pi, np.pi, n),
        velocity=rng.normal(0, 2, (n, 2)),
        ego_translation=np.zeros(3),
    )
    if score is not None:
        d["scores"] = np.full(n, score)
    return d


def test_nuscenes_det_perfect():
    rng = np.random.default_rng(4)
    gts, preds = [], []
    for _ in range(4):
        names = ["car", "pedestrian", "car"]
        centers = rng.uniform(-30, 30, (3, 3))
        g = _det_sample(names, centers, np.random.default_rng(1))
        p = dict(g, scores=np.array([0.9, 0.8, 0.7]))
        gts.append(g)
        preds.append(p)
    out = evaluate_detection(gts, preds, class_names=("car", "pedestrian"))
    assert out["mean_ap"] > 0.99, out
    assert out["NDS"] > 0.99, out
    assert out["trans_err"] < 1e-6


def test_nuscenes_det_empty_preds():
    rng = np.random.default_rng(5)
    g = _det_sample(["car"], [[1.0, 2.0, 0.0]], rng)
    p = dict(
        names=np.zeros((0,), str), translation=np.zeros((0, 3)),
        size=np.zeros((0, 3)), yaw=np.zeros(0), velocity=np.zeros((0, 2)),
        scores=np.zeros(0), ego_translation=np.zeros(3),
    )
    out = evaluate_detection([g], [p])
    assert out["mean_ap"] == 0.0
    assert 0.0 <= out["NDS"] <= 0.5
