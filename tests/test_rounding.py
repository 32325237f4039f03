"""Oracle-parity rounding contract: round_half_up must agree with
DuckDB round() everywhere, including the exact .xxxx5 dyadic ties
where numpy's banker's rounding flips (the round-2 hash-mismatch
class)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray.ops.rounding import round_half_up


def _duck_round(vals, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    return np.array([r[0] for r in con.execute(f"SELECT round(v, {k}) FROM t").fetchall()])


def test_dyadic_ties_match_duckdb():
    # exact ties at the 4th decimal: i/32, i/16 etc. are representable
    vals = np.array([i / 32 for i in range(-64, 65)] + [i / 16 for i in range(-32, 33)])
    np.testing.assert_allclose(round_half_up(vals, 4), _duck_round(vals, 4), atol=0)
    # numpy's default DISAGREES on some of these (sanity: the bug class exists)
    assert not np.array_equal(np.round(vals, 4), round_half_up(vals, 4))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_round_half_up_matches_duckdb(vals, k):
    got = round_half_up(np.array(vals), k)
    exp = _duck_round(vals, k)
    np.testing.assert_allclose(got, exp, atol=0.6 * 10.0 ** (-k))
    # exact equality except where the double's true value sits within
    # float-print distance of a tie; assert it's equal for the vast
    # majority of samples
    eq = got == exp
    assert eq.mean() >= 0.95
