"""Exact linear sum assignment, jittable on TPU.

The reference calls scipy's ``linear_sum_assignment`` on CPU inside every
loss computation (HungarianAssigner3D, core/bbox/assigners/
hungarian_assigner_3d.py:122-128; MapTRAssigner, maptr/assigners/
maptr_assigner.py:122-128), forcing a device→host sync per image per decoder
layer. Here the same shortest-augmenting-path algorithm (Crouse 2016, the one
scipy implements) is written with ``lax`` loops so matching stays on-device
inside the jitted train step.

Rectangular support: ``cost`` is (R, C) with R <= C; every row is assigned a
distinct column. Padded GT rows should be given a *constant* cost row — a
uniform row cannot change the optimal assignment of the real rows, so the
caller can pad variable GT counts to a static maximum and mask the losses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def _solve_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Returns col4row (R,) int32: the column assigned to each row."""
    R, C = cost.shape
    assert R <= C, f"need rows <= cols, got {cost.shape}"
    cost = jnp.asarray(cost, jnp.float32)

    def assign_row(cur_row, state):
        u, v, row4col, col4row = state

        # --- shortest augmenting path from cur_row to an unassigned column
        def path_cond(s):
            return s["sink"] < 0

        def path_body(s):
            i, min_val = s["i"], s["min_val"]
            sr = s["sr"].at[i].set(True)
            r = min_val + cost[i] - u[i] - v  # (C,)
            better = (~s["sc"]) & (r < s["spc"])
            spc = jnp.where(better, r, s["spc"])
            path = jnp.where(better, i, s["path"])
            masked = jnp.where(s["sc"], _INF, spc)
            # tie-break toward unassigned columns (matches scipy)
            j = jnp.argmin(masked - jnp.where(row4col < 0, 1e-12, 0.0))
            min_val = masked[j]
            sc = s["sc"].at[j].set(True)
            sink = jnp.where(row4col[j] < 0, j, -1)
            i = jnp.where(row4col[j] < 0, i, row4col[j])
            return dict(i=i, min_val=min_val, sink=sink, sr=sr, sc=sc,
                        spc=spc, path=path)

        s = jax.lax.while_loop(
            path_cond,
            path_body,
            dict(
                i=cur_row,
                min_val=jnp.float32(0.0),
                sink=jnp.int32(-1),
                sr=jnp.zeros((R,), bool),
                sc=jnp.zeros((C,), bool),
                spc=jnp.full((C,), _INF),
                path=jnp.full((C,), -1, jnp.int32),
            ),
        )
        sink, sr, sc, spc, min_val, path = (
            s["sink"], s["sr"], s["sc"], s["spc"], s["min_val"], s["path"],
        )

        # --- dual variable update
        rows = jnp.arange(R)
        u = u.at[cur_row].add(min_val)
        spc_at_col4row = spc[jnp.clip(col4row, 0, C - 1)]
        u = jnp.where(sr & (rows != cur_row), u + min_val - spc_at_col4row, u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- augment along the alternating path back to cur_row
        def aug_cond(t):
            return ~t[3]

        def aug_body(t):
            j, row4col, col4row, _ = t
            i = path[j]
            row4col = row4col.at[j].set(i)
            next_j = col4row[i]
            col4row = col4row.at[i].set(j)
            return next_j, row4col, col4row, i == cur_row

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row, jnp.bool_(False))
        )
        return u, v, row4col, col4row

    state = (
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        jnp.full((C,), -1, jnp.int32),
        jnp.full((R,), -1, jnp.int32),
    )
    _, _, _, col4row = jax.lax.fori_loop(0, R, assign_row, state)
    return col4row


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve LSA for a (..., R, C) cost tensor (R <= C).

    Returns col4row (..., R) int32: column assigned to each row. Batch dims
    are vmapped.
    """
    if cost.ndim == 2:
        return _solve_single(cost)
    flat = cost.reshape((-1,) + cost.shape[-2:])
    out = jax.vmap(_solve_single)(flat)
    return out.reshape(cost.shape[:-2] + (cost.shape[-2],))
