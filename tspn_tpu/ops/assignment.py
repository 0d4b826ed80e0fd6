"""Linear assignment on device (shortest augmenting path / LAPJV).

Replaces the reference tracker's scipy.optimize.linear_sum_assignment
Hungarian calls (/root/reference/deep_sort/deep_sort/
linear_assignment.py:5, 58-61) with a fixed-shape Jonker-Volgenant
solver that runs entirely inside jit/scan — no host callback per frame.

Algorithm: successive shortest augmenting paths with dual potentials
(the same algorithm scipy's linear_sum_assignment implements). For each
valid row, a masked Dijkstra over columns finds the cheapest augmenting
path to a free column; potentials are updated and the path flipped. All
loops are lax.while_loop / fori_loop with static bounds: rows x O(M)
sink steps x O(M) vector work — O(N*M^2), microseconds at tracker sizes
(<= 64 x 64).

Exactly optimal (not epsilon-approximate); ties may resolve differently
than scipy but total cost matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9
_INF = jnp.inf


@jax.jit
def auction_assignment(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Min-cost assignment of an (N, M) matrix; returns row->col (N,)
    int32 with -1 for unassigned. Invalid rows/cols (padding masks) and
    infeasible entries (cost >= BIG/2) never match.

    Successive augmentation is globally optimal only when every processed
    row can end up matched. Instead of transposing when #valid rows >
    #valid cols (a data-dependent `lax.cond` — under vmap BOTH branches
    execute, doubling every solve in `track_videos_batch`), N dummy
    columns are appended whose cost exceeds every feasible entry: each
    row can always match (dummy == unmatched), which (a) keeps the
    augmenting-path invariant in both orientations and (b) preserves the
    solution — minimizing total cost with a constant dummy price first
    maximizes the number of real matches (scipy's rectangular behavior),
    then minimizes their cost.

    The dummy price must scale with n: growing the real matching by one
    can reshuffle an augmenting CHAIN of up to n edges, raising the
    real-cost sum by up to (2n-1)*spread — a constant 2*spread+1 dummy
    made the solver prefer leaving a chain's last row unmatched
    (regression: tests/test_assignment.py chain case).

    (Name kept from the earlier auction-based implementation for API
    stability; the solver is LAPJV.)
    """
    n, m = cost.shape
    feasible = row_valid[:, None] & col_valid[None, :] & (cost < BIG / 2)
    spread = jnp.clip(jnp.max(jnp.where(feasible, jnp.abs(cost), 0.0)), 1.0)
    dummy = 2.0 * spread * (n + 1) + 1.0
    cost_pad = jnp.concatenate(
        [cost, jnp.full((n, n), jnp.float32(1.0)) * dummy], axis=1
    )
    col_valid_pad = jnp.concatenate([col_valid, jnp.ones((n,), bool)])
    r2c = _lapjv_rows(cost_pad, row_valid, col_valid_pad)
    return jnp.where(r2c >= m, -1, r2c)


def _lapjv_rows(cost, row_valid, col_valid):
    """Scan-over-rows LAPJV core; requires #valid rows <= #valid cols
    with every valid row matchable (callers orient accordingly)."""
    n, m = cost.shape
    feasible = row_valid[:, None] & col_valid[None, :] & (cost < BIG / 2)
    spread = jnp.clip(jnp.max(jnp.where(feasible, jnp.abs(cost), 0.0)), 1.0)
    # infeasible cells get a bounded sentinel so float32 potentials stay
    # accurate; they are stripped from the result afterwards
    sentinel = 2.0 * spread * (min(n, m) + 1)
    c = jnp.where(feasible, cost, sentinel).astype(jnp.float32)

    def assign_row(carry, cur_row):
        u, v, row_to_col, col_to_row = carry

        def do(carry):
            u, v, row_to_col, col_to_row = carry
            sp_cost = jnp.full((m,), _INF, jnp.float32)
            pred = jnp.full((m,), cur_row, jnp.int32)  # row that reaches col j
            done = jnp.zeros((m,), bool)  # columns finalized by Dijkstra
            visited_rows = jnp.zeros((n,), bool)

            def dijkstra_cond(st):
                _, _, _, _, sink, _, it = st
                return (sink < 0) & (it <= m)

            def dijkstra_body(st):
                i, sp_cost, pred, done, sink, min_val, it = st
                reduced = min_val + c[i] - u[i] - v  # (m,)
                better = (reduced < sp_cost) & ~done & col_valid
                sp_cost = jnp.where(better, reduced, sp_cost)
                pred = jnp.where(better, i, pred)

                cand = jnp.where(~done & col_valid, sp_cost, _INF)
                j = jnp.argmin(cand).astype(jnp.int32)
                lowest = cand[j]
                # no reachable column at all -> bail (sink = -2)
                unreachable = ~jnp.isfinite(lowest)
                done = done.at[j].set(True)
                next_sink = jnp.where(
                    unreachable, -2, jnp.where(col_to_row[j] < 0, j, -1)
                ).astype(jnp.int32)
                next_i = jnp.where(next_sink == -1, col_to_row[j], i).astype(jnp.int32)
                return next_i, sp_cost, pred, done, next_sink, lowest, it + 1

            state = (
                cur_row.astype(jnp.int32), sp_cost, pred, done,
                jnp.int32(-1), jnp.float32(0.0), jnp.int32(0),
            )
            # track visited rows for the dual update: a row is visited when
            # it owns a finalized, still-assigned column
            i_fin, sp_cost, pred, done, sink, min_val, _ = jax.lax.while_loop(
                dijkstra_cond, dijkstra_body, state
            )

            def commit(args):
                u, v, row_to_col, col_to_row = args
                # dual updates (scipy _lsap semantics)
                u = u.at[cur_row].add(min_val)
                owned = jnp.where(
                    (col_to_row >= 0) & done, col_to_row, n
                )  # (m,) owner rows of finalized cols
                delta = min_val - sp_cost  # (m,)
                u = u + jnp.zeros_like(u).at[owned].add(
                    jnp.where((col_to_row >= 0) & done, delta, 0.0),
                    mode="drop",
                )
                v = jnp.where(done, v - delta, v)

                # flip the augmenting path ending at sink
                def flip_cond(st):
                    _, _, j, hops = st
                    return (j >= 0) & (hops <= m)

                def flip_body(st):
                    row_to_col, col_to_row, j, hops = st
                    i = pred[j]
                    prev_j = row_to_col[i]
                    col_to_row = col_to_row.at[j].set(i)
                    row_to_col = row_to_col.at[i].set(j)
                    j = jnp.where(i == cur_row, -1, prev_j)
                    return row_to_col, col_to_row, j, hops + 1

                row_to_col, col_to_row, _, _ = jax.lax.while_loop(
                    flip_cond, flip_body, (row_to_col, col_to_row, sink, 0)
                )
                return u, v, row_to_col, col_to_row

            return jax.lax.cond(
                sink >= 0, commit, lambda a: a, (u, v, row_to_col, col_to_row)
            )

        new_carry = jax.lax.cond(
            row_valid[cur_row], do, lambda a: a, (u, v, row_to_col, col_to_row)
        )
        return new_carry, None

    init = (
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((m,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((m,), -1, jnp.int32),
    )
    (u, v, row_to_col, col_to_row), _ = jax.lax.scan(
        assign_row, init, jnp.arange(n)
    )

    # strip sentinel (infeasible) matches
    took_feasible = jnp.take_along_axis(
        feasible, jnp.clip(row_to_col, 0, m - 1)[:, None], axis=1
    )[:, 0]
    return jnp.where((row_to_col >= 0) & took_feasible, row_to_col, -1)


def gated_assignment(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    max_cost: float,
) -> jnp.ndarray:
    """DeepSORT-style assignment: costs are capped at max_cost + 1e-5
    before solving, and matches whose true cost exceeds max_cost are
    dropped afterwards (linear_assignment.py:57-76 semantics)."""
    capped = jnp.where(cost > max_cost, max_cost + 1e-5, cost)
    row_to_col = auction_assignment(capped, row_valid, col_valid)
    matched_cost = jnp.take_along_axis(
        cost, jnp.clip(row_to_col, 0)[:, None], axis=1
    )[:, 0]
    return jnp.where(
        (row_to_col >= 0) & (matched_cost <= max_cost), row_to_col, -1
    )
