"""Cross-engine bit-portable ``ln`` over positive integers.

libm ``ln`` differs by 1 ulp between the JVM (Java ``Math.log``) and
DuckDB's C library. Wherever a query rounds an ln-derived value (or
ranks by one), that ulp flips a rounding/ordering boundary with small
per-row probability — invisible at test scale, near-certain at some
larger scale (``weighted_sample_orders`` failed exactly this way at
sf0.1's 150k rows). The fix used throughout this repo: compute ln with
a FIXED atanh series over +,-,*,/ only. IEEE requires those operations
(and sqrt) to be correctly rounded, so the identical expression
produces the bit-identical double on every engine; only the argument's
bit-length extraction is engine-specific.

For an integer v ≥ 1 (up to 2^53):

    B = bitlength(v);  m = v / 2^(B-1) ∈ [1, 2)
    ln(v) = (B-1)·ln2 + 2·atanh(z),   z = (m-1)/(m+1) ∈ [0, 1/3)
    atanh(z) ≈ z · Σ_{k=0..15} z^(2k) / (2k+1)

Series-truncation error < 6e-18; TOTAL deviation from true ln is
larger — the LN2 literal is 1/2-ulp off ln(2) exactly and the Horner
fold accumulates rounding, so absolute error measures up to ~1e-14
over random 53-bit inputs. Both are irrelevant for matching: the whole
deviation is SHARED (both engines evaluate the identical expression,
so they land on the identical double), and ~1e-14 is far below every
rounding resolution used by callers.

The stage templates below are SHARED STRINGS: the Spark side evaluates
them with ``F.expr`` over staged columns, the DuckDB side splices them
into chained CTEs — same text, same IEEE ops, same bits. Columns are
prefixed so several ln computations can coexist in one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: repr(math.log(2)) — the same decimal string parses to the same
#: double on both engines (correctly-rounded strtod).
LN2_SQL = "CAST('0.6931471805599453' AS DOUBLE)"


def horner_sql(z2: str) -> str:
    """Σ z^(2k)/(2k+1), k = 0..15, Horner form over the ``z2`` column."""
    expr = "CAST(1 AS DOUBLE)/CAST(31 AS DOUBLE)"
    for k in range(29, 0, -2):
        expr = f"CAST(1 AS DOUBLE)/CAST({k} AS DOUBLE) + {z2} * ({expr})"
    return expr


def m_sql(p: str) -> str:
    return f"CAST({p}v AS DOUBLE) / CAST({p}shift AS DOUBLE)"


def z_sql(p: str) -> str:
    return f"({p}m - CAST(1 AS DOUBLE)) / ({p}m + CAST(1 AS DOUBLE))"


def z2_sql(p: str) -> str:
    return f"{p}z * {p}z"


def lnint_sql(p: str) -> str:
    """ln(v) over the staged ``{p}b``/``{p}z``/``{p}z2`` columns."""
    return (
        f"CAST({p}b - 1 AS DOUBLE) * {LN2_SQL} "
        f"+ CAST(2 AS DOUBLE) * ({p}z * ({horner_sql(p + 'z2')}))"
    )


def lnint_inline_sql(v_sql: str) -> str:
    """Self-contained ``ln(v)`` expression over an integer SQL
    expression — for positions where the staged-column form can't
    reach (inside higher-order-function lambdas, e.g. a fold over
    array elements). Textually substitutes the SAME template the
    staged form evaluates, so the arithmetic (and therefore every
    bit of the result) is identical; the cost is repeated
    subexpressions (~10 kB of expression text per call site), paid
    once at plan time. Spark-side only — DuckDB oracles keep using
    ``duck_lnint_ctes`` (CTE staging), which is the same arithmetic.
    """
    b = f"CAST(length(conv(CAST({v_sql} AS BIGINT), 10, 2)) AS INT)"
    shift = f"shiftleft(cast(1 as bigint), {b} - 1)"
    m = f"(CAST({v_sql} AS DOUBLE) / CAST({shift} AS DOUBLE))"
    z = f"(({m} - CAST(1 AS DOUBLE)) / ({m} + CAST(1 AS DOUBLE)))"
    z2 = f"({z} * {z})"
    return (
        f"(CAST({b} - 1 AS DOUBLE) * {LN2_SQL} "
        f"+ CAST(2 AS DOUBLE) * ({z} * ({horner_sql(z2)})))"
    )


def lnint_inline_sql_duck(v_sql: str) -> str:
    """DuckDB spelling of :func:`lnint_inline_sql` — the SAME
    m/z/horner templates with DuckDB's bit-length (``length(bin(v))``)
    and shift (``<<``) spellings, so the arithmetic (and therefore
    every bit of the double) is identical across engines."""
    b = f"CAST(length(bin(CAST({v_sql} AS BIGINT))) AS INT)"
    shift = f"(CAST(1 AS BIGINT) << ({b} - 1))"
    m = f"(CAST({v_sql} AS DOUBLE) / CAST({shift} AS DOUBLE))"
    z = f"(({m} - CAST(1 AS DOUBLE)) / ({m} + CAST(1 AS DOUBLE)))"
    z2 = f"({z} * {z})"
    return (
        f"(CAST({b} - 1 AS DOUBLE) * {LN2_SQL} "
        f"+ CAST(2 AS DOUBLE) * ({z} * ({horner_sql(z2)})))"
    )


def stage_spark_lnint(df: DataFrame, v_sql: str, prefix: str) -> DataFrame:
    """Append the ln-stage columns for integer expression ``v_sql``;
    the final value is available as ``F.expr(lnint_sql(prefix))``."""
    p = prefix
    return (
        df.withColumn(f"{p}v", F.expr(f"CAST({v_sql} AS BIGINT)"))
        .withColumn(f"{p}b", F.expr(f"length(conv({p}v, 10, 2))").cast("int"))
        .withColumn(f"{p}shift", F.expr(f"shiftleft(cast(1 as bigint), {p}b - 1)"))
        .withColumn(f"{p}m", F.expr(m_sql(p)))
        .withColumn(f"{p}z", F.expr(z_sql(p)))
        .withColumn(f"{p}z2", F.expr(z2_sql(p)))
    )


def spark_lnint_ctes(src: str, out: str, v_sql: str, prefix: str, carry: str = "*") -> str:
    """Spark-SQL CTE chain staging the same columns as
    :func:`duck_lnint_ctes` — the same m/z/z2 template strings over
    Spark's bit-length (``length(conv(v, 10, 2))``) and shift
    (``shiftleft``) spellings, so the arithmetic (and therefore every
    bit of the double from ``lnint_sql(prefix)``) is identical to both
    the DuckDB chain and the inline form. Exists because
    :func:`lnint_inline_sql` textually substitutes its argument ~130×
    (the Horner fan-out), and a query with several inline lns pays
    seconds of parse/analyze/codegen for what is arithmetic on a
    handful of rows — ``fellegi_sunter_linkage`` measured ~8 s of plan
    compile from six inline sites (r12). Staged columns keep the tree
    linear: Catalyst's CollapseProject never inlines a non-trivial
    alias referenced more than once, so the stages survive
    optimization."""
    p = prefix
    return f"""{out}_v AS (SELECT {carry}, CAST({v_sql} AS BIGINT) AS {p}v FROM {src}),
{out}_b AS (SELECT *, CAST(length(conv({p}v, 10, 2)) AS INT) AS {p}b FROM {out}_v),
{out}_s AS (SELECT *, shiftleft(cast(1 as bigint), {p}b - 1) AS {p}shift FROM {out}_b),
{out}_m AS (SELECT *, {m_sql(p)} AS {p}m FROM {out}_s),
{out}_z AS (SELECT *, {z_sql(p)} AS {p}z FROM {out}_m),
{out} AS (SELECT *, {z2_sql(p)} AS {p}z2 FROM {out}_z)"""


def duck_lnint_ctes(src: str, out: str, v_sql: str, prefix: str, carry: str = "*") -> str:
    """DuckDB CTE chain staging the same columns from relation ``src``
    into relation ``out`` (carrying ``carry`` columns along); the final
    value is ``lnint_sql(prefix)`` selected from ``out``."""
    p = prefix
    return f"""{out}_v AS (SELECT {carry}, CAST({v_sql} AS BIGINT) AS {p}v FROM {src}),
{out}_b AS (SELECT *, CAST(length(bin({p}v)) AS INT) AS {p}b FROM {out}_v),
{out}_s AS (SELECT *, (CAST(1 AS BIGINT) << ({p}b - 1)) AS {p}shift FROM {out}_b),
{out}_m AS (SELECT *, {m_sql(p)} AS {p}m FROM {out}_s),
{out}_z AS (SELECT *, {z_sql(p)} AS {p}z FROM {out}_m),
{out} AS (SELECT *, {z2_sql(p)} AS {p}z2 FROM {out}_z)"""
