"""Exact LSA solver vs scipy (the reference's assigner backend)."""
import numpy as np
import pytest
import scipy.optimize

from apollo_vision_net_tpu.ops.hungarian import linear_sum_assignment

pytestmark = pytest.mark.quick  # numpy/interpret tier, no big jit graphs


def total_cost(cost, col4row):
    return cost[np.arange(cost.shape[0]), col4row].sum()


def test_square_matches_scipy():
    rng = np.random.default_rng(0)
    for n in (1, 2, 5, 13, 40):
        cost = rng.standard_normal((n, n)).astype(np.float32)
        ours = np.asarray(linear_sum_assignment(cost))
        assert len(set(ours.tolist())) == n, "assignment must be a matching"
        r, c = scipy.optimize.linear_sum_assignment(cost)
        np.testing.assert_allclose(
            total_cost(cost, ours), cost[r, c].sum(), rtol=1e-5, atol=1e-5
        )


def test_rectangular():
    rng = np.random.default_rng(1)
    for (r, c) in ((3, 10), (7, 9), (20, 900), (1, 4)):
        cost = rng.standard_normal((r, c)).astype(np.float32)
        ours = np.asarray(linear_sum_assignment(cost))
        assert len(set(ours.tolist())) == r
        rr, cc = scipy.optimize.linear_sum_assignment(cost)
        np.testing.assert_allclose(
            total_cost(cost, ours), cost[rr, cc].sum(), rtol=1e-5, atol=1e-5
        )


def test_batched():
    rng = np.random.default_rng(2)
    cost = rng.standard_normal((4, 6, 15)).astype(np.float32)
    ours = np.asarray(linear_sum_assignment(cost))
    for b in range(4):
        rr, cc = scipy.optimize.linear_sum_assignment(cost[b])
        np.testing.assert_allclose(
            total_cost(cost[b], ours[b]), cost[b][rr, cc].sum(),
            rtol=1e-5, atol=1e-5,
        )


def test_padded_rows_do_not_disturb_real_rows():
    """Uniform-cost padded rows must leave real rows' optimum unchanged —
    the contract the loss code relies on for static GT padding."""
    rng = np.random.default_rng(3)
    real = rng.standard_normal((5, 30)).astype(np.float32)
    pad = np.full((3, 30), 100.0, np.float32)
    padded = np.concatenate([real, pad], axis=0)
    ours = np.asarray(linear_sum_assignment(padded))[:5]
    rr, cc = scipy.optimize.linear_sum_assignment(real)
    np.testing.assert_allclose(
        total_cost(real, ours), real[rr, cc].sum(), rtol=1e-5, atol=1e-5
    )
