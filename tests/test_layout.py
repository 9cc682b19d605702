"""Data-layout family: Z-order clustering report semantics + plan."""

from __future__ import annotations

from efficient_llm_data_wrangling_spark.queries.layout import (
    _ZBITS,
    _ZFILES,
    _z_interleave,
    zorder_layout_report,
)
from tests.conftest import SF_SMOKE


def test_z_interleave_formula_matches_bit_twiddling():
    """The div/mod interleave expression must equal the classic
    bit-twiddled Morton code for every pair in a corner-heavy grid."""
    expr = _z_interleave("x", "y", "//")

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(_ZBITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [0, 1, 2, 3, 5, 255, 256, 32767, 32768, 65534, 65535]
    for x in pts:
        for y in pts:
            assert eval(expr) == morton(x, y)  # noqa: S307 — our own expr


def test_zorder_prunes_secondary_column(spark):
    """The whole point: under a customer-key slab predicate the
    Z-order layout must scan strictly fewer files than the date-sorted
    layout (which, having no custkey locality, scans all of them)."""
    rows = {r.layout: r for r in zorder_layout_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {"zorder", "date_sorted"}
    for r in rows.values():
        assert r.n_files == _ZFILES
        assert 0 < r.files_scanned <= r.n_files
        assert r.rows_scanned > 0
    assert rows["date_sorted"].files_scanned == _ZFILES  # no locality
    assert rows["zorder"].files_scanned < rows["date_sorted"].files_scanned
    assert rows["zorder"].rows_scanned < rows["date_sorted"].rows_scanned


def test_zorder_plan_single_pass_no_cartesian(spark):
    """One orders scan feeds both layout aggregates (the bounds row is
    a broadcast, not a cartesian), and everything stays JVM-side."""
    plan = (
        zorder_layout_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compaction_plan_invariants(spark):
    """The compaction plan must conserve bytes, never increase file
    count, bound write amplification at 1000 permille, and classify
    every input file exactly once (right-sized + small = before)."""
    from efficient_llm_data_wrangling_spark.queries.layout import (
        compaction_plan_report,
    )
    from tests.conftest import SF_SMOKE

    rows = compaction_plan_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_right_sized + r.n_small == r.n_files_before
        assert 0 < r.n_files_after <= r.n_files_before
        assert 0 <= r.bytes_rewritten <= r.bytes_total
        assert 0 <= r.write_amp_permille <= 1000
        assert r.avg_file_bytes_after >= r.avg_file_bytes_before


def test_retention_plan_replays_interval_rule(spark):
    """Every column must recompute from a pure Python replay of the
    interval rule over the same (partition, version-day) inventory
    (the rule retains any file whose reference interval reaches the
    window, including files written before the cutoff — the case an
    age-based delete gets wrong when version gaps span the cutoff)."""
    from efficient_llm_data_wrangling_spark.queries.layout import (
        _RET_DAYS,
        snapshot_retention_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    rows = {r.part: r for r in snapshot_retention_plan(spark, SF_SMOKE).collect()}
    assert rows
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.col("event_type").alias("part"),
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400").alias("v"),
            (F.lit(32) + F.coalesce(F.length("props"), F.lit(0))).alias("rb"),
        )
        .groupBy("part", "v")
        .agg(F.sum("rb").alias("bytes"))
        .collect()
    )
    inv: dict[str, dict[int, int]] = {}
    for r in ev:
        inv.setdefault(r.part, {})[r.v] = r.bytes
    v_max = max(v for d in inv.values() for v in d)
    n_versions = len({v for d in inv.values() for v in d})
    min_keep = v_max - _RET_DAYS + 1
    for part, days in inv.items():
        vs = sorted(days)
        expired, reclaim, total = 0, 0, 0
        for i, v in enumerate(vs):
            nxt = vs[i + 1] if i + 1 < len(vs) else None
            total += days[v]
            if nxt is not None and nxt - 1 < min_keep:
                expired += 1
                reclaim += days[v]
        r = rows[part]
        assert r.n_files == len(vs)
        assert r.n_live == 1
        assert r.n_expired == expired
        assert r.n_retained == len(vs) - expired
        assert r.bytes_total == total
        assert r.bytes_reclaimable == reclaim
        assert r.reclaim_permille == reclaim * 1000 // total
        assert r.live_version == vs[-1]
        assert r.min_keep_version == min_keep
        assert r.n_versions == n_versions


def test_reshard_movement_replays_in_pure_python(spark):
    """Pure-Python replay of both strategies at the smoke SF: key
    hashes, residue owners, ring intervals (rebuilt independently from
    hashlib), per-key owner walks, movement counts, and both model
    columns; the structural claims must hold (ring strictly moves
    less; every key maps to exactly one interval)."""
    import hashlib

    from efficient_llm_data_wrangling_spark.queries.layout import (
        _RSH_AFTER,
        _RSH_BEFORE,
        _RSH_VNODES,
        reshard_movement_plan,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    rows = {r.strategy: r for r in reshard_movement_plan(spark, SF_SMOKE).collect()}
    assert set(rows) == {"mod_hash", "consistent_ring"}

    docs = [r.doc_id for r in load_table(spark, SF_SMOKE, "documents").select("doc_id").collect()]
    h = {d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) for d in docs}

    def ring(n):
        pts = sorted(
            (int(hashlib.md5(f"ring:{s}:{v}".encode()).hexdigest()[:8], 16), s)
            for s in range(n)
            for v in range(_RSH_VNODES)
        )
        return pts

    def owner(pts, k):
        # successor point on the ring; wrap to the first
        for p, s in pts:
            if k <= p:
                return s
        return pts[0][1]

    pb, pa = ring(_RSH_BEFORE), ring(_RSH_AFTER)
    ring_moved = sum(1 for d in docs if owner(pb, h[d]) != owner(pa, h[d]))
    mod_moved = sum(1 for d in docs if h[d] % _RSH_BEFORE != h[d] % _RSH_AFTER)
    n = len(docs)

    m = rows["mod_hash"]
    assert (m.n_docs, m.n_moved) == (n, mod_moved)
    assert m.moved_permille == mod_moved * 1000 // n
    assert m.expected_permille == _RSH_BEFORE * 1000 // _RSH_AFTER
    r = rows["consistent_ring"]
    assert (r.n_docs, r.n_moved) == (n, ring_moved)
    assert r.moved_permille == ring_moved * 1000 // n
    # realized arc share of the new shard, recomputed from the ring
    arcs = 0
    last = None
    for i, (p, s) in enumerate(pa):
        lo = pa[i - 1][0] + 1 if i > 0 else 0
        if s == _RSH_AFTER - 1:
            arcs += p - lo + 1
        last = (p, s)
    if pa[0][1] == _RSH_AFTER - 1:
        arcs += (1 << 32) - 1 - last[0]
    assert r.expected_permille == arcs * 1000 // (1 << 32)
    # the structural claim: the ring strictly beats mod-hash
    assert r.n_moved * 5 < m.n_moved


def _xy2d_classic(n: int, x: int, y: int) -> int:
    """Textbook Wikipedia xy2d (C bit-twiddling transcribed)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rot
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _xy2d_bounded(bits: int, x: int, y: int) -> int:
    """The query's bounded recurrence (strip processed bits before
    the reflect/swap), transcribed from the SQL stages."""
    d = 0
    for i in range(bits):
        s = 2 ** (bits - 1 - i)
        rx, ry = (x // s) % 2, (y // s) % 2
        xm, ym = x % s, y % s
        d += s * s * (0 if (rx == 0 and ry == 0) else 1 if rx == 0 else 2 if ry == 1 else 3)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - ym, s - 1 - xm
            else:
                x, y = ym, xm
        else:
            x, y = xm, ym
    return d


def test_hilbert_bounded_recurrence_matches_textbook():
    """Exhaustive 64x64 grid at 6 bits, plus a corner sweep at the
    full 16 bits: the SQL's bounded variant must equal the classic
    algorithm everywhere (the negative-reflection hazard the bounded
    form exists to remove)."""
    for x in range(64):
        for y in range(64):
            assert _xy2d_bounded(6, x, y) == _xy2d_classic(64, x, y)
    m = (1 << 16) - 1
    for x in (0, 1, 12345, 40000, m - 1, m):
        for y in (0, 7, 999, 54321, m):
            assert _xy2d_bounded(16, x, y) == _xy2d_classic(1 << 16, x, y)


def test_hilbert_layout_report_replays_in_pure_python(spark):
    """The five report rows must recompute exactly from the collected
    orders: 16-bit ranks, both curves, both file budgets, zone-map
    verdicts, row bookkeeping."""
    from efficient_llm_data_wrangling_spark.queries.layout import (
        _HFILES_MISALIGNED,
        _ZBITS,
        _ZFILES,
        hilbert_layout_report,
    )
    from efficient_llm_data_wrangling_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE
    import pyspark.sql.functions as F

    rows = hilbert_layout_report(spark, SF_SMOKE).collect()
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            F.col("o_custkey").alias("x"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    xs, ys = [r.x for r in o], [r.y for r in o]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    m = 2**_ZBITS - 1
    c1, c2 = mnx + (mxx - mnx) * 31 // 64, mnx + (mxx - mnx) * 33 // 64
    d1, d2 = mny + (mxy - mny) * 31 // 64, mny + (mxy - mny) * 33 // 64
    layouts = {}
    for x, y in zip(xs, ys):
        sx = (x - mnx) * m // max(mxx - mnx, 1)
        sy = (y - mny) * m // max(mxy - mny, 1)
        hd = _xy2d_bounded(_ZBITS, sx, sy)
        zd = sum(
            (((sx >> i) & 1) << (2 * i)) + (((sy >> i) & 1) << (2 * i + 1))
            for i in range(_ZBITS)
        )
        fd = (y - mny) * _ZFILES // (mxy - mny + 1)
        for key, fid in (
            (("hilbert", _ZFILES), hd // (4**_ZBITS // _ZFILES)),
            (("hilbert", _HFILES_MISALIGNED), hd // (4**_ZBITS // _HFILES_MISALIGNED)),
            (("zorder", _ZFILES), zd // (4**_ZBITS // _ZFILES)),
            (("zorder", _HFILES_MISALIGNED), zd // (4**_ZBITS // _HFILES_MISALIGNED)),
            (("date_sorted", _ZFILES), fd),
        ):
            st = layouts.setdefault(key, {}).setdefault(fid, [x, x, y, y, 0])
            st[0], st[1] = min(st[0], x), max(st[1], x)
            st[2], st[3] = min(st[2], y), max(st[3], y)
            st[4] += 1
    got = {(r.layout, r.files_target): r for r in rows}
    assert len(rows) == len(layouts)
    for key, files in layouts.items():
        r = got[key]
        assert r.n_files == len(files)
        assert r.files_scanned_x == sum(1 for v in files.values() if v[0] <= c2 and v[1] >= c1)
        assert r.rows_scanned_x == sum(v[4] for v in files.values() if v[0] <= c2 and v[1] >= c1)
        assert r.files_scanned_y == sum(1 for v in files.values() if v[2] <= d2 and v[3] >= d1)
        assert r.rows_scanned_y == sum(v[4] for v in files.values() if v[2] <= d2 and v[3] >= d1)
