"""Z-order layout (operators/layout.py): Morton-key correctness vs a
Python reference interleave, tile locality of the bucket audit, the
simulated pruning self-checks, and — the point of the module — REAL
parquet-footer pruning: zorder_write vs a linear sort, skip decisions
made from actual pyarrow row-group statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_engineering_project_spark.operators import layout


def _py_spread16(v: int) -> int:
    v &= 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _py_zkey(x: int, y: int) -> int:
    return _py_spread16(x) | (_py_spread16(y) << 1)


def test_zorder_key_matches_python_reference(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(pts, "x: bigint, y: bigint")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", layout.zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_zkey(x, y), (x, y)
    # bit interleave sanity: unit steps move single bits
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_scale_expr_is_exact_integer_division(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (500,), (999,), (1000,)], "v: bigint"
    ).withColumn("_mn", F.lit(0).cast("bigint")).withColumn(
        "_mx", F.lit(1000).cast("bigint")
    )
    got = [
        r.s
        for r in df.select(
            layout.scale_expr("v", "_mn", "_mx").alias("s")
        ).collect()
    ]
    assert got == [v * 65535 // 1000 for v in (0, 1, 500, 999, 1000)]
    # degenerate span -> 0, not a divide-by-zero
    deg = df.withColumn("_mx", F.lit(0).cast("bigint"))
    assert {
        r.s
        for r in deg.select(
            layout.scale_expr("v", "_mn", "_mx").alias("s")
        ).collect()
    } == {0}


def test_locality_buckets_are_tiles(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    rows = layout.zorder_locality(
        li, "l_partkey", "l_suppkey", n_buckets=64
    ).collect()
    assert rows, "no buckets"
    # 64 equal-width z buckets = 8192x8192 tiles: every bucket's span
    # in BOTH dimensions is bounded by the tile edge
    for r in rows:
        assert r.x_max - r.x_min <= 8191, r
        assert r.y_max - r.y_min <= 8191, r


def test_pruning_audit_self_checks(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    by = {
        r.layout: r
        for r in layout.pruning_audit(
            li, "l_partkey", "l_suppkey", n_files=64
        ).collect()
    }
    z, lin = by["zorder"], by["linear_x"]
    # the ANSWER is layout-independent; only the I/O differs
    assert z.rows_matching == lin.rows_matching
    assert z.files_total == lin.files_total == 64
    # every matching row lives in a scanned file
    assert z.rows_in_scanned_files >= z.rows_matching
    assert lin.rows_in_scanned_files >= lin.rows_matching
    if z.rows_matching:
        assert z.files_scanned < lin.files_scanned
        assert z.rows_in_scanned_files < lin.rows_in_scanned_files


def _files_scanned(path: str, xcol: str, ycol: str, box) -> tuple[int, int]:
    """(files_total, files_scanned) by the real reader rule: read a
    file iff its footer min/max stats intersect the box on BOTH
    columns — computed from actual parquet metadata, not from rows."""
    xlo, xhi, ylo, yhi = box
    total = scanned = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        total += 1
        idx = {md.schema.column(i).name: i for i in range(len(md.schema))}
        xmn = min(
            md.row_group(g).column(idx[xcol]).statistics.min
            for g in range(md.num_row_groups)
        )
        xmx = max(
            md.row_group(g).column(idx[xcol]).statistics.max
            for g in range(md.num_row_groups)
        )
        ymn = min(
            md.row_group(g).column(idx[ycol]).statistics.min
            for g in range(md.num_row_groups)
        )
        ymx = max(
            md.row_group(g).column(idx[ycol]).statistics.max
            for g in range(md.num_row_groups)
        )
        if xmx >= xlo and xmn <= xhi and ymx >= ylo and ymn <= yhi:
            scanned += 1
    return total, scanned


def test_physical_footer_pruning_zorder_beats_linear(spark, tmp_path):
    # sf0.01 on purpose (not the sf0.001 fixture): the demo needs key
    # domains wide enough (2000 parts x 100 suppliers) that fixed-point
    # scaling noise doesn't blur the tile edges
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pmn, pmx, smn, smx = stats

    # raw-key box = the EXACT preimage of the scaled tile
    # [24576, 32767] x [24576, 32767] (the [3/8, 1/2) slice of each
    # dimension): xs = (x-mn)*65535 // span, so xs >= lo iff
    # x >= mn + ceil(lo*span/65535) and xs <= hi iff
    # x < mn + ceil((hi+1)*span/65535). Tile-aligned boxes are what a
    # layout-aware planner asks for (a box straddling the TOP
    # interleaved bit is the Morton curve's known worst seam), and the
    # preimage math keeps fixed-point rounding from bleeding the box
    # one scaled unit over a tile edge.
    def preimage(mn, mx, lo=24576, hi=32767):
        span = mx - mn
        return (mn + -(-lo * span // 65535), mn + -(-(hi + 1) * span // 65535) - 1)

    xlo, xhi = preimage(pmn, pmx)
    ylo, yhi = preimage(smn, smx)
    box = (xlo, xhi, ylo, yhi)
    n_files = 64
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    layout.zorder_write(li, "l_partkey", "l_suppkey", zpath, n_files=n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    ztot, zscan = _files_scanned(zpath, "l_partkey", "l_suppkey", box)
    ltot, lscan = _files_scanned(lpath, "l_partkey", "l_suppkey", box)
    assert ztot == ltot == n_files
    # both layouts hold the same rows; the box matches some
    n_match = li.filter(
        F.col("l_partkey").between(box[0], box[1])
        & F.col("l_suppkey").between(box[2], box[3])
    ).count()
    assert n_match > 0
    # the headline: the z layout's REAL footers skip strictly more
    # files than the single-column sort's for the two-sided predicate
    assert zscan < lscan, (zscan, lscan)
    # and the answer is reachable from the scanned files alone
    zrows = spark.read.parquet(zpath).filter(
        F.col("l_partkey").between(box[0], box[1])
        & F.col("l_suppkey").between(box[2], box[3])
    ).count()
    assert zrows == n_match


def test_spread_sql_twin_matches_column_twin():
    # the SQL string twin must produce the identical spread for the
    # same inputs (it's what the DuckDB oracle replays) — checked in
    # DuckDB itself against the Python reference
    import duckdb

    vals = [i * 977 % 65536 for i in range(200)] + [0, 1, 65535]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {layout.spread_bits16_sql('v')} AS s "
        "FROM (SELECT UNNEST(?::BIGINT[]) AS v)",
        [vals],
    ).fetchall()
    assert [r[0] for r in got] == [_py_spread16(v) for v in vals]


def test_with_zorder_rejects_bits_over_16_and_reserved_columns(spark):
    """ADVICE r12: spread_bits16 masks to 16 bits, so bits>16 would
    silently collide distinct keys; and the pipeline's helper names
    must not be silently replaced or turned ambiguous by the stats
    crossJoin."""
    df = spark.createDataFrame([(1, 2)], "x: bigint, y: bigint")
    with pytest.raises(ValueError, match=r"bits must be in \[1, 16\]"):
        layout.with_zorder(df, "x", "y", bits=17)
    with pytest.raises(ValueError, match="bits must be"):
        layout.with_zorder(df, "x", "y", bits=0)
    clash = spark.createDataFrame([(1, 2, 3)], "x: bigint, y: bigint, zkey: bigint")
    with pytest.raises(ValueError, match="reserved"):
        layout.with_zorder(clash, "x", "y")
    clash2 = spark.createDataFrame([(1, 2, 3)], "x: bigint, y: bigint, _xs: bigint")
    with pytest.raises(ValueError, match="reserved"):
        layout.with_zorder(clash2, "x", "y")


def test_zorder_write_default_file_count_is_shuffle_partitions(spark, tmp_path):
    """ADVICE r12: n_files=None keeps Spark's range-partitioning
    default (spark.sql.shuffle.partitions), matching write_clustered —
    the 2-column delegation must not invent a hardcoded 64."""
    df = spark.range(2000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 2000).alias("y")
    )
    out = str(tmp_path / "zdefault")
    layout.zorder_write(df, "x", "y", out, n_files=None)
    n = len(glob.glob(f"{out}/*.parquet"))
    # under AQE the unpinned range exchange may coalesce below the
    # configured count on tiny data — the invariant is "session
    # default semantics, never a hardcoded 64"
    assert 1 <= n <= int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_write_zordered_bits_over_16_uses_generic_path(spark, tmp_path):
    """bits>16 routes 2-column writes to the float-normalized generic
    key instead of silently truncating in the 16-bit spreader."""
    from data_engineering_project_spark.sources.layout import write_zordered

    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * 13 % 1000).alias("y")
    )
    out = str(tmp_path / "zwide")
    write_zordered(df, out, cluster_by=["x", "y"], num_files=4, bits=20)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"x", "y"}


def _py_spread3(v: int) -> int:
    v &= 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def test_zorder3_key_matches_python_reference(spark):
    pts = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
           (1023, 1023, 1023), (123, 456, 789)]
    df = spark.createDataFrame(pts, "x: bigint, y: bigint, z: bigint")
    got = {
        (r.x, r.y, r.z): r.k
        for r in df.select(
            "x", "y", "z",
            layout.zorder3_key(
                F.col("x"), F.col("y"), F.col("z")
            ).alias("k"),
        ).collect()
    }
    for x, y, z in pts:
        naive = sum(
            (((x >> b) & 1) << (3 * b))
            | (((y >> b) & 1) << (3 * b + 1))
            | (((z >> b) & 1) << (3 * b + 2))
            for b in range(10)
        )
        assert got[(x, y, z)] == naive == (
            _py_spread3(x) | (_py_spread3(y) << 1) | (_py_spread3(z) << 2)
        ), (x, y, z)
    assert got[(1, 0, 0)] == 1 and got[(0, 1, 0)] == 2 and got[(0, 0, 1)] == 4
    assert got[(1023, 1023, 1023)] == (1 << 30) - 1


def test_zorder3_spread_sql_twin_matches_column_twin():
    import duckdb

    sql = layout.spread_bits3_sql("v")
    got = duckdb.sql(
        f"SELECT v, {sql} AS s FROM (SELECT UNNEST(RANGE(0, 1024)) AS v)"
    ).fetchall()
    assert all(s == _py_spread3(v) for v, s in got)


def test_pruning_audit3_three_sided_box_beats_linear(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    rows = {
        r["layout"]: r
        for r in layout.pruning_audit3(
            li, "l_orderkey", "l_partkey", "l_suppkey", n_files=64
        ).collect()
    }
    z, lin = rows["zorder3"], rows["linear_x"]
    # identical answers, fewer files AND fewer rows scanned on 3-D
    assert z["rows_matching"] == lin["rows_matching"]
    assert z["files_total"] == lin["files_total"] == 64
    assert z["files_scanned"] < lin["files_scanned"]
    assert z["rows_in_scanned_files"] < lin["rows_in_scanned_files"]


def test_with_zorder3_validates_bits_and_reserved(spark):
    df = spark.createDataFrame([(1, 2, 3)], "x: bigint, y: bigint, z: bigint")
    with pytest.raises(ValueError, match=r"bits must be in \[1, 10\]"):
        layout.with_zorder3(df, "x", "y", "z", bits=11)
    clash = spark.createDataFrame(
        [(1, 2, 3, 4)], "x: bigint, y: bigint, z: bigint, _zs: bigint"
    )
    with pytest.raises(ValueError, match="reserved"):
        layout.with_zorder3(clash, "x", "y", "z")
