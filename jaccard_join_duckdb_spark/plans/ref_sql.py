"""DuckDB-dialect SQL generators reproducing the reference pipeline.

These emit single-statement (CTE-composed) ANSI/DuckDB SQL whose
results are bit-for-bit what the reference's staged ``CREATE TABLE``
pipeline produces (``py_duckdb/similarity_join/join/jaccard_join.py``).
They serve two purposes:

1. ``oracle_sql()`` entries in ``__spark_entry__.py`` — the driver
   runs them in DuckDB against the same parquet tables and
   hash-compares with the Spark result.
2. Reference-parity tests: the Spark operators must equal these
   exactly — including the reference's known recall quirk (the
   lexicographic ``concat(len,'_',id)`` pair key makes e.g.
   ``'10_x' < '9_y'``, flipping filter roles for records whose token
   counts differ in digit count; SURVEY.md §4.3.2), which is why the
   filtered oracle is the reference pipeline and not brute force.

Thresholds are emitted as bare decimal literals — exactly what the
reference's f-string interpolation produces (jaccard_join.py:160) —
which DuckDB and Spark SQL both parse as DECIMAL, giving exact
threshold arithmetic on ties. The Spark DataFrame operators reproduce
the same tie behavior with integer cross-multiplied comparisons
(operators/jaccard.py "threshold bounds"); thresholds whose repr is
not a short decimal fall back to ``CAST(<repr> AS DOUBLE)`` on both
sides, keeping the engines aligned in either regime.
"""

from __future__ import annotations

from fractions import Fraction

from ..tokenizers import DelimiterTokzr, QGramsTokzr, Tokenizer

__all__ = [
    "tokens_sql",
    "self_filtered_sql",
    "self_brute_sql",
    "inner_filtered_sql",
    "inner_brute_sql",
]

# Keep in lockstep with operators.jaccard._MAX_EXACT_DEN.
_MAX_EXACT_DEN = 100_000


def _t(t: float) -> str:
    r = repr(float(t))
    try:
        fr = Fraction(r)
    except (ValueError, OverflowError):
        fr = None
    if fr is not None and 0 < fr.denominator <= _MAX_EXACT_DEN:
        return r
    return f"CAST({r} AS DOUBLE)"


def tokens_sql(
    from_table: str, key: str, val: str, tokenizer: Tokenizer,
    dialect: str = "duckdb",
) -> str:
    """The reference tokenizer SQL template instantiated
    (``tokenizers/__init__.py:7-8``), emitting ``(id, len, token)``.

    ``dialect='spark'`` emits the same semantics in Spark SQL syntax
    (``split``/``filter``/``transform`` + LATERAL VIEW explode) — the
    pipeline bodies downstream are engine-neutral ANSI, so the full
    generators run unchanged on either engine.
    """
    if dialect == "duckdb":
        if isinstance(tokenizer, QGramsTokzr):
            q = tokenizer.q
            inner = (
                f"list_transform(generate_series(1, len({val}) + {q} - 1), x -> "
                f"substring(concat(repeat('#', {q} - 1), lower({val}), "
                f"repeat('#', {q} - 1)), x, {q}))"
            )
        elif isinstance(tokenizer, DelimiterTokzr):
            inner = (
                f"list_filter(str_split_regex({val}, '{tokenizer.pattern}'), "
                "x -> trim(x) != '')"
            )
        else:  # pragma: no cover
            raise TypeError(f"no SQL template for {type(tokenizer).__name__}")
        if tokenizer.return_set:
            inner = f"list_distinct({inner})"
        return (
            f"select {key} as id, len(tks) as len, lower(unnest(tks)) as token "
            f"from (select {key}, {inner} as tks from {from_table})"
        )
    if dialect == "spark":
        if isinstance(tokenizer, QGramsTokzr):
            q = tokenizer.q
            inner = (
                f"transform(sequence(1, length({val}) + {q} - 1), x -> "
                f"substr(concat(repeat('#', {q} - 1), lower({val}), "
                f"repeat('#', {q} - 1)), x, {q}))"
            )
        elif isinstance(tokenizer, DelimiterTokzr):
            inner = (
                f"filter(split({val}, '{tokenizer.pattern}', -1), "
                "x -> trim(x) != '')"
            )
        else:  # pragma: no cover
            raise TypeError(f"no SQL template for {type(tokenizer).__name__}")
        if tokenizer.return_set:
            inner = f"array_distinct({inner})"
        return (
            f"select id, size(tks) as len, lower(tk) as token "
            f"from (select {key} as id, {inner} as tks from {from_table}) "
            f"lateral view explode(tks) _t as tk"
        )
    raise ValueError(f"unknown dialect {dialect!r}")  # pragma: no cover


def _score_sql(overlap: str, l_len: str, r_len: str) -> str:
    """``, <expr> as jaccard`` — exact similarity from overlap and set
    sizes, one correctly-rounded double division on integer operands
    (bit-identical to operators.jaccard._jaccard_score, including the
    NULL on the case-collapse quirk's zero denominator). Extension
    column; the reference emits pairs only (SURVEY.md §4.3.7)."""
    return (
        f", cast({overlap} as double)"
        f" / nullif({l_len} + {r_len} - ({overlap}), 0) as jaccard"
    )


def self_brute_sql(
    from_table: str, key: str, val: str, tokenizer: Tokenizer, t: float,
    l_out: str = "l_id", r_out: str = "r_id", dialect: str = "duckdb",
    score: bool = False,
) -> str:
    """jaccard_join.py:190-201."""
    sc = _score_sql("count(*)", "L.len", "R.len") if score else ""
    return f"""
with tokens as ({tokens_sql(from_table, key, val, tokenizer, dialect)})
select L.id as {l_out}, R.id as {r_out}{sc}
from tokens L, tokens R
where L.token = R.token and L.id < R.id
group by L.id, L.len, R.id, R.len
having count(*) >= ((L.len + R.len) * {_t(t)} / (1 + {_t(t)}))
"""


def self_filtered_sql(
    from_table: str, key: str, val: str, tokenizer: Tokenizer, t: float,
    l_out: str = "l_id", r_out: str = "r_id", dialect: str = "duckdb",
    score: bool = False,
) -> str:
    """The full filtered self-join pipeline (jaccard_join.py:111-188)
    as one CTE chain."""
    T = _t(t)
    sc = (
        _score_sql("count(*) + pfxOverlap - 1", "L.len", "R.len")
        if score else ""
    )
    return f"""
with tokens as ({tokens_sql(from_table, key, val, tokenizer, dialect)}),
dfq as (select token, count(*) as df from tokens group by token),
tkdf as (
  select id, len, tokens.token,
         row_number() over (partition by id order by df, tokens.token) as pos,
         concat(len, '_', id) as l_id
  from tokens, dfq where tokens.token = dfq.token),
candset as (
  select L.id as Lid, R.id as Rid,
         max(L.pos) as LmaxPos, max(R.pos) as RmaxPos, count(*) as pfxOverlap
  from tkdf L, tkdf R
  where L.l_id < R.l_id
    and L.token = R.token
    and L.len >= (R.len * {T})
    and L.len - L.pos + 1 >= (L.len * 2 * {T} / (1 + {T}))
    and R.len - R.pos + 1 >= (R.len * {T})
    and least((L.len - L.pos + 1), (R.len - R.pos + 1)) >=
        ((L.len + R.len) * {T} / (1 + {T}))
  group by L.id, R.id)
select L.id as {l_out}, R.id as {r_out}{sc}
from tkdf L, tkdf R, candset c
where c.Lid = L.id and c.Rid = R.id and L.token = R.token
  and L.pos >= LmaxPos and R.pos >= RmaxPos
group by L.id, R.id, L.len, R.len, pfxOverlap
having count(*) + pfxOverlap - 1 >= ((L.len + R.len) * {T} / (1 + {T}))
"""


def inner_brute_sql(
    l_table: str, r_table: str, l_key: str, r_key: str, l_val: str, r_val: str,
    tokenizer: Tokenizer, t: float, l_out: str = "l_id", r_out: str = "r_id",
    dialect: str = "duckdb", score: bool = False,
) -> str:
    """jaccard_join.py:407-420."""
    T = _t(t)
    sc = _score_sql("count(*)", "L.len", "R.len") if score else ""
    return f"""
with l_tokens as ({tokens_sql(l_table, l_key, l_val, tokenizer, dialect)}),
r_tokens as ({tokens_sql(r_table, r_key, r_val, tokenizer, dialect)})
select L.id as {l_out}, R.id as {r_out}{sc}
from l_tokens L, r_tokens R
where L.token = R.token
group by L.id, L.len, R.id, R.len
having count(*) >= ((L.len + R.len) * {T} / (1 + {T}))
"""


def inner_filtered_sql(
    l_table: str, r_table: str, l_key: str, r_key: str, l_val: str, r_val: str,
    tokenizer: Tokenizer, t: float, l_out: str = "l_id", r_out: str = "r_id",
    dialect: str = "duckdb", score: bool = False,
) -> str:
    """The two-table pipeline (jaccard_join.py:235-405) including the
    widow placeholder and the driver-side (R, S) swap, encoded as a
    guarded UNION ALL: R-side CTEs take ``l`` when
    ``l_widows > r_widows`` else ``r`` (ties to (r, l) —
    jaccard_join.py:353). Output columns follow the reference's
    matches() naming (jaccard_join.py:391): the column named
    ``{R_out_prefix}{l_key_attr}`` — i.e. with equal key names,
    ``l_out`` always carries the LEFT-table id regardless of which
    side was chosen as R; the final projection un-swaps accordingly.
    """
    T = _t(t)
    sc = (
        _score_sql("count(*) + pfxOverlap - 1", "R.len", "S.len")
        if score else ""
    )
    sc_out = ", m.jaccard" if score else ""
    return f"""
with l_tokens as ({tokens_sql(l_table, l_key, l_val, tokenizer, dialect)}),
r_tokens as ({tokens_sql(r_table, r_key, r_val, tokenizer, dialect)}),
ph as (select (select count(*) from {l_table}) * (select count(*) from {r_table}) + 1 as widow_ph),
dfq as (
  select coalesce(l_tks.token, r_tks.token) as token,
         coalesce(l_tks.df * r_tks.df, (select widow_ph from ph)) as df
  from (select token, count(*) as df from l_tokens group by token) l_tks
  full outer join (select token, count(*) as df from r_tokens group by token) r_tks
  on l_tks.token = r_tks.token),
l_tkdf as (
  select id, len, l_tokens.token, df,
         row_number() over (partition by id order by df, l_tokens.token) as pos
  from l_tokens, dfq where l_tokens.token = dfq.token),
r_tkdf as (
  select id, len, r_tokens.token, df,
         row_number() over (partition by id order by df, r_tokens.token) as pos
  from r_tokens, dfq where r_tokens.token = dfq.token),
widows as (
  select
    (select count(*) from l_tkdf where len - pos + 1 >= (len * 2 * {T} / (1 + {T}))
      and df = (select widow_ph from ph)) as lw,
    (select count(*) from r_tkdf where len - pos + 1 >= (len * 2 * {T} / (1 + {T}))
      and df = (select widow_ph from ph)) as rw),
idx_tkdf as (
  select * from l_tkdf where (select lw from widows) > (select rw from widows)
  union all
  select * from r_tkdf where (select lw from widows) <= (select rw from widows)),
prb_tkdf as (
  select * from r_tkdf where (select lw from widows) > (select rw from widows)
  union all
  select * from l_tkdf where (select lw from widows) <= (select rw from widows)),
idx_pfx as (select id, len, token, pos from idx_tkdf
          where len - pos + 1 >= (len * 2 * {T} / (1 + {T}))),
prb_pfx as (select id, len, token, pos from prb_tkdf
          where len - pos + 1 >= (len * {T})),
candset as (
  select Rpfx.id as Rid, Spfx.id as Sid,
         max(Rpfx.pos) as RmaxPos, max(Spfx.pos) as SmaxPos, count(*) as pfxOverlap
  from idx_pfx Rpfx, prb_pfx Spfx
  where Rpfx.token = Spfx.token
    and Rpfx.len >= (Spfx.len * {T})
    and Spfx.len >= (Rpfx.len * {T})
    and least((Rpfx.len - Rpfx.pos + 1), (Spfx.len - Spfx.pos + 1)) >=
        ((Rpfx.len + Spfx.len) * {T} / (1 + {T}))
  group by Rpfx.id, Spfx.id),
m as (
  select R.id as r_side_id, S.id as s_side_id{sc}
  from idx_tkdf R, prb_tkdf S, candset c
  where c.Rid = R.id and c.Sid = S.id and R.token = S.token
    and R.pos >= RmaxPos and S.pos >= SmaxPos
  group by R.id, S.id, R.len, S.len, pfxOverlap
  having count(*) + pfxOverlap - 1 >= ((R.len + S.len) * {T} / (1 + {T})))
select
  case when (select lw from widows) > (select rw from widows)
       then m.r_side_id else m.s_side_id end as {l_out},
  case when (select lw from widows) > (select rw from widows)
       then m.s_side_id else m.r_side_id end as {r_out}{sc_out}
from m
"""
