"""Property test: the vectorized skip-scan is bit-identical to the
scalar loop (ADVICE r1: previously equivalence rested on the incidental
density of one real dataset — property tests stayed under the 4096
dispatch floor and the differential suite's density always chose the
scalar path).

Covers the regime the skip-scan exists for (n >= 4096, mean step <<
0.02*brick) plus dense and mixed regimes, reversals, and gap jumps.
"""

import numpy as np
import pytest

from renkodf_spark.kernel import (
    choose_scan,
    grid_anchor,
    new_output,
    output_arrays,
    scan_ticks,
    scan_ticks_vectorized,
)

BRICK = 10.0


def _walk(seed: int, n: int, step_sigma: float, jump_p: float = 0.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, step_sigma, n)
    if jump_p:
        jumps = rng.choice(
            [0.0, 2.5 * BRICK, -2.5 * BRICK], size=n, p=[1 - jump_p, jump_p / 2, jump_p / 2]
        )
        steps = steps + jumps
    return 1000.0 + np.cumsum(steps)


def _run_both(prices: np.ndarray):
    times = list(range(len(prices)))
    anchor = grid_anchor(float(prices[0]), BRICK)

    st_s = [anchor, 0, anchor, anchor, 1, 1]
    out_s = new_output()
    n_s = scan_ticks(times, prices.tolist(), 1, BRICK, st_s, out_s)

    st_v = [anchor, 0, anchor, anchor, 1, 1]
    out_v = new_output()
    n_v = scan_ticks_vectorized(times, prices, 1, BRICK, st_v, out_v)
    return (n_s, st_s, output_arrays(out_s), out_s["event_time"]), (
        n_v,
        st_v,
        output_arrays(out_v),
        out_v["event_time"],
    )


def _assert_identical(scalar, vec):
    n_s, st_s, arr_s, t_s = scalar
    n_v, st_v, arr_v, t_v = vec
    assert n_s == n_v
    assert st_s == st_v, "final kernel state differs"
    assert list(t_s) == list(t_v)
    for name, a in arr_s.items():
        if name == "event_time":
            continue
        np.testing.assert_array_equal(a, arr_v[name], err_msg=name)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_sparse_regime_bit_identical(seed):
    # mean |step| ~0.025 + rare jumps -> density well below the 0.02
    # dispatch threshold; the jumps force emissions and reversals
    prices = _walk(seed, n=6000, step_sigma=0.03, jump_p=0.001)
    assert choose_scan(prices, BRICK), "fixture must land in the vectorized regime"
    scalar, vec = _run_both(prices)
    _assert_identical(scalar, vec)
    n_bricks = scalar[0]
    assert n_bricks > 0, "fixture should emit at least one brick"


@pytest.mark.parametrize("seed", [10, 11])
def test_dense_regime_bit_identical(seed):
    # near-every-tick emission: vectorized must stay exact even where
    # the scalar loop would normally be chosen
    prices = _walk(seed, n=5000, step_sigma=8.0)
    scalar, vec = _run_both(prices)
    _assert_identical(scalar, vec)
    assert scalar[0] > 1000


@pytest.mark.parametrize("seed", [20, 21])
def test_block_boundary_and_dead_zone(seed):
    # prices oscillating just inside/outside the reversal dead zone,
    # sized to cross the 8192-tick block boundary of the skip-scan
    rng = np.random.default_rng(seed)
    base = 1000.0
    prices = base + rng.choice(
        [0.0, 0.4 * BRICK, -0.4 * BRICK, 1.1 * BRICK, -1.1 * BRICK, 1.9 * BRICK, -1.9 * BRICK],
        size=20000,
        p=[0.3, 0.2, 0.2, 0.1, 0.1, 0.05, 0.05],
    )
    scalar, vec = _run_both(prices)
    _assert_identical(scalar, vec)
