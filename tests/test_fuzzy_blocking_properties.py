"""Completeness properties of the two-family blocking behind
fuzzy_name_matches (plans/warehouse.py): every equal-length pair within
FUZZY_MAX_DIST=2 must share a block key —
- 1-2 SUBSTITUTIONS touch <=2 of the 5 interleaved position-mod-5 pieces,
  so the pair agrees on some excluded-2-subset key (keyids 0-9);
- 1 INSERT + 1 DELETE (the shift class) yields identical single-deletion
  variants on both sides (keyid 10).
Together that is every equal-length dist<=2 pair, which lets the candidate
join replace the all-pairs (nation, length) block without losing pairs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_storage_cloud_spark.plans.warehouse import (
    _FUZZY_PIECE_SPAN,
    FUZZY_DEL_SPAN,
    _fuzzy_keys,
)


def _py_pieces(name: str):
    # python replica of _fuzzy_piece: piece j = chars at positions j, j+5,...
    # (1-based), up to _FUZZY_PIECE_SPAN samples
    return [
        "".join(
            name[j - 1 + 5 * t] if j - 1 + 5 * t < len(name) else ""
            for t in range(_FUZZY_PIECE_SPAN)
        )
        for j in range(1, 6)
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
    for d in range(1, min(FUZZY_DEL_SPAN, len(name)) + 1):
        out.append((10, name[: d - 1] + name[d:]))
    return set(out)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + string.digits + "#", min_size=1, max_size=24),
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


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet=string.ascii_lowercase + string.digits + "#", min_size=2, max_size=24),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=23),
    st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=1),
)
def test_insert_delete_pairs_always_share_a_deletion_key(name, ins_pos, del_pos, ch):
    """The shift class: delete one char, insert another elsewhere — the
    equal-length dist-2 pairs the piece keys cannot see."""
    if del_pos >= len(name):
        return
    deleted = name[:del_pos] + name[del_pos + 1 :]
    ins = min(ins_pos, len(deleted))
    other = deleted[:ins] + ch + deleted[ins:]
    assert len(other) == len(name)
    assert _py_keys(name) & _py_keys(other), (name, other)


def test_python_keying_matches_sql_expression_shape():
    """The python replica used above must enumerate the same (keyid, keyval)
    structure as the SQL generator feeding both engines."""
    sql_keys = _fuzzy_keys("c_name")
    assert len(sql_keys) == 10 + FUZZY_DEL_SPAN
    assert [k for k, _, _ in sql_keys[:10]] == list(range(10))
    assert all(k == 10 for k, _, _ in sql_keys[10:])
    for kid, expr, guard in sql_keys[:10]:
        assert expr.startswith("concat_ws(':'")
        assert expr.count("substring") == 3 * _FUZZY_PIECE_SPAN
        assert guard is None
    for d, (kid, expr, guard) in enumerate(sql_keys[10:], start=1):
        assert expr.count("substring") == 2
        assert guard == f"nlen >= {d}"


def test_lsh_signs_match_sql_md5_expression():
    """The Spark-side literal sign arrays (_lsh_signs, hashlib md5) must
    equal what the oracle's SQL md5 expression computes — the invariant
    that lets signatures be precomputed driver-side instead of 64 x bits
    md5 calls per row."""
    import duckdb

    from kafka_connect_storage_cloud_spark.llm.similarity import _lsh_signs

    for prefix, j in (("q0:", 0), ("g3:", 2), ("cb7:", 5), ("", 1)):
        sql = f"""
        SELECT list_transform(generate_series(0, 63),
          i -> CASE WHEN (CAST(('0x' || substr(md5('{prefix}{j}' || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 2) = 0
               THEN 1 ELSE -1 END)
        """
        duck_signs = duckdb.sql(sql).fetchall()[0][0]
        assert list(duck_signs) == _lsh_signs(prefix, j), (prefix, j)
