import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tspn_tpu.ops.assignment import auction_assignment, gated_assignment


def _total_cost(cost, row_to_col):
    return sum(
        cost[i, c] for i, c in enumerate(row_to_col) if c >= 0
    )


def test_matches_scipy_square(rng):
    for _ in range(10):
        n = 8
        cost = rng.rand(n, n).astype(np.float32)
        got = np.asarray(
            auction_assignment(
                jnp.asarray(cost), jnp.ones(n, bool), jnp.ones(n, bool)
            )
        )
        assert np.all(got >= 0)
        assert len(set(got.tolist())) == n  # a permutation
        r, c = linear_sum_assignment(cost)
        assert _total_cost(cost, got) == pytest.approx(
            cost[r, c].sum(), abs=1e-3
        )


def test_matches_scipy_rectangular(rng):
    for _ in range(5):
        cost = rng.rand(4, 9).astype(np.float32)
        got = np.asarray(
            auction_assignment(
                jnp.asarray(cost), jnp.ones(4, bool), jnp.ones(9, bool)
            )
        )
        assert np.all(got >= 0)
        r, c = linear_sum_assignment(cost)
        assert _total_cost(cost, got) == pytest.approx(cost[r, c].sum(), abs=1e-3)


def test_respects_validity_masks(rng):
    cost = rng.rand(5, 5).astype(np.float32)
    row_valid = jnp.asarray([True, True, False, True, False])
    col_valid = jnp.asarray([True, False, True, True, True])
    got = np.asarray(auction_assignment(jnp.asarray(cost), row_valid, col_valid))
    assert got[2] == -1 and got[4] == -1
    assert 1 not in got.tolist()
    assigned = [c for c in got if c >= 0]
    assert len(assigned) == len(set(assigned)) == 3


def test_more_rows_than_cols(rng):
    cost = rng.rand(6, 3).astype(np.float32)
    got = np.asarray(
        auction_assignment(jnp.asarray(cost), jnp.ones(6, bool), jnp.ones(3, bool))
    )
    assigned = [c for c in got if c >= 0]
    assert len(assigned) == 3
    assert len(set(assigned)) == 3
    r, c = linear_sum_assignment(cost)
    assert _total_cost(cost, got) == pytest.approx(cost[r, c].sum(), abs=1e-3)


def test_gated_assignment_drops_expensive_matches():
    cost = jnp.asarray(
        [[0.1, 5.0],
         [5.0, 9.0]]
    )
    got = np.asarray(
        gated_assignment(cost, jnp.ones(2, bool), jnp.ones(2, bool), max_cost=1.0)
    )
    assert got[0] == 0
    assert got[1] == -1  # 9.0 > max_cost -> unmatched even though assigned


def test_orientation_follows_valid_counts_not_padded_shape():
    """A (32, 10) padded matrix holding an effective 4x5 problem: the
    static shape says transpose (32 > 10) but the VALID counts say
    row-major (4 <= 5). The old static orientation dropped an
    uncontested optimal match (found by the tracker parity oracle)."""
    import jax.numpy as jnp

    from tspn_tpu.ops.assignment import gated_assignment

    k, d = 32, 10
    cost = np.full((k, d), 1e6, np.float32)
    rows = np.zeros(k, bool)
    rows[[0, 1, 3, 4]] = True
    cols = np.zeros(d, bool)
    cols[:5] = True
    rng = np.random.RandomState(0)
    for r in np.flatnonzero(rows):
        for c in np.flatnonzero(cols):
            cost[r, c] = 1.0 + 0.01 * rng.rand()
    for r, c in [(0, 0), (1, 1), (3, 3), (4, 4)]:
        cost[r, c] = 0.02
    r2c = np.asarray(
        gated_assignment(jnp.asarray(cost), jnp.asarray(rows), jnp.asarray(cols), 0.2)
    )
    assert r2c[0] == 0 and r2c[1] == 1 and r2c[3] == 3 and r2c[4] == 4


def test_augmenting_chain_reaches_full_matching():
    """Chain-structured costs where the only full matching shifts every
    row by one column: a dummy price that does not scale with n made
    the solver leave the chain's last row unmatched (scipy matches all
    four). Regression for the n-scaled dummy-column price."""
    import jax.numpy as jnp

    from tspn_tpu.ops.assignment import auction_assignment

    n = 4
    cost = np.full((n, n), 1e9, np.float32)
    for i in range(3):
        cost[i, i] = 0.0      # cheap identity option
        cost[i, i + 1] = 1.0  # shifted option
    cost[3, 0] = 1.0          # last row only matches column 0
    out = np.asarray(
        auction_assignment(
            jnp.asarray(cost), jnp.ones(n, bool), jnp.ones(n, bool)
        )
    )
    np.testing.assert_array_equal(out, [1, 2, 3, 0])


def test_long_chain_matches_scipy_cardinality_and_cost():
    """Longer chains (n=12) under a gate cap, vs the scipy oracle."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from tspn_tpu.ops.assignment import auction_assignment

    n = 12
    cost = np.full((n, n), 1e9, np.float32)
    for i in range(n - 1):
        cost[i, i] = 0.0
        cost[i, i + 1] = 0.7  # DeepSORT IoU-cost cap scale
    cost[n - 1, 0] = 0.7
    out = np.asarray(
        auction_assignment(
            jnp.asarray(cost), jnp.ones(n, bool), jnp.ones(n, bool)
        )
    )
    r, c = linear_sum_assignment(np.where(cost > 1e8, 1e5, cost))
    total_ref = cost[r, c].sum()
    assert (out >= 0).all()
    total_got = cost[np.arange(n), out].sum()
    assert total_got == pytest.approx(total_ref)
