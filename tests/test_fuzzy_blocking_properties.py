"""Completeness property of the pigeonhole piece blocking behind
fuzzy_name_matches (plans/warehouse.py): any pair of equal-length strings
that differ by at most FUZZY_MAX_DIST=2 SUBSTITUTIONS must share at least
one of the C(5,2)=10 block keys — the guarantee that lets the candidate
join replace the all-pairs (nation, length) block without losing pairs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_storage_cloud_spark.plans.warehouse import _fuzzy_keys


def _py_pieces(name: str):
    L = len(name)
    def sub(start, length):
        s = max(start, 1) - 1
        return name[s : s + length] if length > 0 else ""
    return [
        sub(1, max(L - 8, 0)),
        sub(L - 7, 2),
        sub(L - 5, 2),
        sub(L - 3, 2),
        sub(L - 1, 2),
    ]


def _py_keys(name: str):
    pieces = _py_pieces(name)
    out = []
    kid = 0
    for i in range(5):
        for j in range(i + 1, 5):
            kept = [pieces[k] for k in range(5) if k not in (i, j)]
            out.append((kid, ":".join(kept)))
            kid += 1
    return set(out)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + string.digits + "#", min_size=9, max_size=24),
    st.lists(st.integers(min_value=0, max_value=23), min_size=0, max_size=2),
    st.text(alphabet=string.ascii_lowercase + string.digits, min_size=2, max_size=2),
)
def test_two_substitution_pairs_always_share_a_key(name, positions, repl):
    other = list(name)
    for idx, pos in enumerate(positions):
        if pos < len(other):
            other[pos] = repl[idx]
    other = "".join(other)
    assert _py_keys(name) & _py_keys(other), (name, other)


def test_python_keying_matches_sql_expression_shape():
    """The python replica used above must enumerate the same (keyid, pieces)
    structure as the SQL generator feeding both engines."""
    sql_keys = _fuzzy_keys("c_name", "nlen")
    assert len(sql_keys) == 10
    assert [k for k, _ in sql_keys] == list(range(10))
    for _, expr in sql_keys:
        assert expr.startswith("concat_ws(':'")
        assert expr.count("substring") == 3
