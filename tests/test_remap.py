"""Weighted conservative remap (A1 variant) — models the reference's
weight-reuse regrid (extract.py:150-160,204-213): weights conserve mass,
remap totals equal source totals, and the weights join broadcasts."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ecmwf_models_spark.operators.remap import (
    conservative_weights_1d,
    remap_weighted,
)


def test_weights_conserve_per_src(spark):
    w = conservative_weights_1d(spark, 64, 24).toPandas()
    sums = w.groupby("src_cell")["w"].sum()
    assert len(sums) == 64
    assert (abs(sums - 1.0) < 1e-12).all()
    # uneven grids genuinely split: some src cells hit two dst cells
    assert (w.groupby("src_cell").size() > 1).any()


def test_remap_conserves_mass(spark):
    fact = spark.createDataFrame(
        [(i % 64, float(i)) for i in range(1000)], ["cell_id", "value"]
    )
    w = conservative_weights_1d(spark, 64, 24)
    out = remap_weighted(fact, w, ("value",))
    total_src = fact.agg(F.sum("value")).first()[0]
    total_dst = out.agg(F.sum("value_remap")).first()[0]
    assert abs(total_src - total_dst) < 1e-6
    assert out.count() == 24


def test_identity_remap_when_grids_divide(spark):
    """64 -> 16 divides evenly: every src maps to exactly one dst with
    weight 1 (pure coarsening)."""
    w = conservative_weights_1d(spark, 64, 16).toPandas()
    assert len(w) == 64
    assert (w["w"] == 1.0).all()
    assert (w["dst_cell"] == w["src_cell"] // 4).all()


def test_weights_join_broadcasts(spark):
    fact = spark.createDataFrame(
        [(i % 64, float(i)) for i in range(100)], ["cell_id", "value"]
    )
    w = conservative_weights_1d(spark, 64, 24)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        remap_weighted(fact, w, ("value",)).explain("simple")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_bilinear_weights_reproduce_linear_field(spark):
    """Defining property of bilinear interpolation: exact on any field
    linear in (lat, lon), for every interior destination point; weights
    sum to 1 everywhere (including clamped out-of-extent points)."""
    from pyspark.sql import functions as F

    from ecmwf_models_spark.operators.remap import (
        bilinear_weights_2d,
        remap_weighted,
    )

    nlat = nlon = 8
    src = spark.range(nlat * nlon).select(
        F.col("id").cast("int").alias("cell_id"),
        (
            3.0
            + 2.0 * F.expr("id div 8").cast("double")
            + 0.5 * (F.col("id") % 8).cast("double")
        ).alias("val"),  # 3 + 2*lat + 0.5*lon on the unit grid
    )
    nd = 30
    dst = spark.range(nd * nd).select(
        F.col("id").cast("int").alias("gpi"),
        (F.expr("id div 30") * F.lit(0.25)).alias("lat"),
        ((F.col("id") % 30) * F.lit(0.25)).alias("lon"),
    )
    w = bilinear_weights_2d(dst, 0.0, 1.0, nlat, 0.0, 1.0, nlon)
    out = remap_weighted(src, w, ("val",)).collect()
    assert len(out) == nd * nd
    for r in out:
        lat = (r["dst_cell"] // nd) * 0.25
        lon = (r["dst_cell"] % nd) * 0.25
        assert abs(r["w_sum"] - 1.0) < 1e-12
        if lat <= 7.0 and lon <= 7.0:  # interior: exact
            assert abs(r["val_remap"] - (3.0 + 2.0 * lat + 0.5 * lon)) < 1e-9
        else:  # clamped: value of the boundary-clamped coordinates
            cl, cn = min(lat, 7.0), min(lon, 7.0)
            assert abs(r["val_remap"] - (3.0 + 2.0 * cl + 0.5 * cn)) < 1e-9


def test_bicubic_linear_precision_and_interpolation(spark):
    """Catmull-Rom has linear precision: exact on any field linear in
    (lat, lon) wherever the full 4x4 stencil is interior (no edge
    clamp), and it interpolates (passes through source nodes). Weights
    sum to 1 everywhere, including clamped edge stencils."""
    from ecmwf_models_spark.operators.remap import (
        bicubic_weights_2d,
        remap_weighted,
    )

    nlat = nlon = 8
    src = spark.range(nlat * nlon).select(
        F.col("id").cast("int").alias("cell_id"),
        (
            3.0
            + 2.0 * F.expr("id div 8").cast("double")
            + 0.5 * (F.col("id") % 8).cast("double")
        ).alias("val"),
    )
    nd = 30
    dst = spark.range(nd * nd).select(
        F.col("id").cast("int").alias("gpi"),
        (F.expr("id div 30") * F.lit(0.25)).alias("lat"),
        ((F.col("id") % 30) * F.lit(0.25)).alias("lon"),
    )
    w = bicubic_weights_2d(dst, 0.0, 1.0, nlat, 0.0, 1.0, nlon)
    out = remap_weighted(src, w, ("val",)).collect()
    assert len(out) == nd * nd
    interior_checked = 0
    for r in out:
        lat = (r["dst_cell"] // nd) * 0.25
        lon = (r["dst_cell"] % nd) * 0.25
        assert abs(r["w_sum"] - 1.0) < 1e-12
        # full interior stencil: i0 in [1,5] needs lat in [1,6]; same lon
        if 1.0 <= lat <= 6.0 and 1.0 <= lon <= 6.0:
            assert abs(r["val_remap"] - (3.0 + 2.0 * lat + 0.5 * lon)) < 1e-9
            interior_checked += 1
        if lat == int(lat) and lon == int(lon) and lat <= 7 and lon <= 7:
            # interpolation property at the nodes themselves
            assert abs(r["val_remap"] - (3.0 + 2.0 * lat + 0.5 * lon)) < 1e-9
    assert interior_checked > 300


def test_idw_weights_properties(spark):
    """`dis` method invariants: weights sum to 1 per dst point, an exact
    node hit takes the whole weight, and off-node weights order by
    inverse distance (closest corner gets the largest weight)."""
    from ecmwf_models_spark.operators.remap import idw_weights_2d

    dst = spark.createDataFrame(
        [
            (0, 3.0, 5.0),   # exact node hit -> single weight 1 at (3,5)
            (1, 2.25, 3.5),  # interior, nearest corner is (2.0, 3.5)-side
            (2, 7.25, 7.25), # clamped beyond extent: corner (7,7) closest
        ],
        "gpi int, lat double, lon double",
    )
    rows = idw_weights_2d(dst, 0.0, 1.0, 8, 0.0, 1.0, 8).collect()
    by_dst = {}
    for r in rows:
        by_dst.setdefault(r["dst_cell"], {})[r["src_cell"]] = r["w"]
    assert by_dst[0] == {3 * 8 + 5: 1.0}
    w1 = by_dst[1]
    assert len(w1) == 4
    assert abs(sum(w1.values()) - 1.0) < 1e-12
    # (2.25, 3.5): corner (2,3) at d=sqrt(.0625+.25) and (2,4) at the
    # same distance tie for closest; both beat the i=3 row corners
    assert w1[2 * 8 + 3] == w1[2 * 8 + 4]
    assert w1[2 * 8 + 3] > w1[3 * 8 + 3]
    w2 = by_dst[2]
    assert abs(sum(w2.values()) - 1.0) < 1e-12
    assert max(w2, key=w2.get) == 7 * 8 + 7


def test_laf_picks_max_weight_category(spark):
    """`laf` method: dst takes the category of the max-weight src cell;
    exact weight ties break to the lower src_cell deterministically."""
    from ecmwf_models_spark.operators.remap import (
        bilinear_weights_2d,
        remap_laf,
    )

    fact = spark.range(64).select(
        F.col("id").cast("int").alias("cell_id"),
        (F.col("id") % 7).cast("int").alias("cat"),
    )
    dst = spark.createDataFrame(
        [
            (0, 2.1, 3.9),  # dominant corner (2, 4) -> cell 20 -> cat 6
            (1, 5.5, 2.0),  # tx=0: corners (5,2) w=.5 and (6,2) w=.5 tie
        ],
        "gpi int, lat double, lon double",
    )
    w = bilinear_weights_2d(dst, 0.0, 1.0, 8, 0.0, 1.0, 8)
    got = {
        r["dst_cell"]: (r["cat_laf"], r["laf_w"])
        for r in remap_laf(fact, w, "cat").collect()
    }
    assert got[0] == ((2 * 8 + 4) % 7, pytest.approx(0.9 * 0.9))
    # tie at w=0.5: lower src_cell (5*8+2=42) wins -> cat 0
    assert got[1] == ((5 * 8 + 2) % 7, 0.5)


def test_nearest_weights_pick_closest_node(spark):
    from pyspark.sql import functions as F

    from ecmwf_models_spark.operators.remap import nearest_weights_2d

    dst = spark.createDataFrame(
        [(0, 2.2, 3.6), (1, 0.5, 0.49), (2, 9.0, -1.0)],
        "gpi int, lat double, lon double",
    )
    got = {
        r["dst_cell"]: r["src_cell"]
        for r in nearest_weights_2d(dst, 0.0, 1.0, 8, 0.0, 1.0, 8).collect()
    }
    assert got[0] == 2 * 8 + 4          # (2.2, 3.6) -> node (2, 4)
    assert got[1] == 1 * 8 + 0          # 0.5 rounds half-up to 1, 0.49 -> 0
    assert got[2] == 7 * 8 + 0          # clamped to corner row/col


def test_con2_exact_on_linear_field(spark):
    """Defining property of SECOND-order conservative remap: a field
    whose cell means are linear in x remaps to the exact linear dst cell
    means (first-order con smears them at split cells). Also: constant
    fields reduce con2 to con, and total mass is conserved exactly
    (sum_j w2(i,j) == 0 per src cell)."""
    from ecmwf_models_spark.operators.remap import (
        conservative_weights_1d_2nd,
        remap_con2,
    )

    n_src, n_dst = 64, 24
    alpha, beta = 3.5, -1.25
    # cell means of f(x) = alpha*x + beta on [0,1]: f at the centroid
    fact = spark.createDataFrame(
        [
            (i, alpha * ((i + 0.5) / n_src) + beta)
            for i in range(n_src)
        ],
        ["cell_id", "val"],
    )
    w = conservative_weights_1d_2nd(spark, n_src, n_dst)
    out = remap_con2(fact, w, "val", n_src=n_src).toPandas()
    assert len(out) == n_dst
    for _, r in out.iterrows():
        j = int(r["dst_cell"])
        expect = alpha * ((j + 0.5) / n_dst) + beta
        got = r["val_remap"] / r["w_sum"]
        assert got == pytest.approx(expect, abs=1e-9), (j, got, expect)

    # w2 sums to zero per src cell -> mass conservation incl. gradient
    wp = w.toPandas()
    per_src = wp.groupby("src_cell")["w2"].sum()
    assert (per_src.abs() < 1e-15).all()

    # constant field: con2 == con exactly
    const = spark.createDataFrame(
        [(i, 7.0) for i in range(n_src)], ["cell_id", "val"]
    )
    got = remap_con2(const, w, "val", n_src=n_src).toPandas()
    assert (got["val_remap"] / got["w_sum"]).round(12).eq(7.0).all()


def test_con2_beats_con_on_smooth_field(spark):
    """Quadratic field: the second-order reconstruction must have
    strictly smaller max error than first-order con on split cells."""
    import numpy as np

    from ecmwf_models_spark.operators.remap import (
        conservative_weights_1d,
        conservative_weights_1d_2nd,
        remap_con2,
        remap_weighted,
    )

    n_src, n_dst = 64, 24
    # exact cell means of f(x) = x^2: (hi^3 - lo^3) / (3 (hi - lo))
    def mean2(lo, hi):
        return (hi**3 - lo**3) / (3 * (hi - lo))

    fact = spark.createDataFrame(
        [
            (i, mean2(i / n_src, (i + 1) / n_src))
            for i in range(n_src)
        ],
        ["cell_id", "val"],
    )
    w1 = conservative_weights_1d(spark, n_src, n_dst)
    w2 = conservative_weights_1d_2nd(spark, n_src, n_dst)
    con = remap_weighted(fact, w1, ("val",)).toPandas()
    con2 = remap_con2(fact, w2, "val", n_src=n_src).toPandas()
    exact = {
        j: mean2(j / n_dst, (j + 1) / n_dst) for j in range(n_dst)
    }
    e1 = max(
        abs(r["val_remap"] / r["w_sum"] - exact[int(r["dst_cell"])])
        for _, r in con.iterrows()
    )
    e2 = max(
        abs(r["val_remap"] / r["w_sum"] - exact[int(r["dst_cell"])])
        for _, r in con2.iterrows()
    )
    assert e2 < e1 / 2, (e1, e2)
    assert np.isfinite(e2)


SRC_GRID = (-60.0, 15.0, 8, 0.0, 15.0, 8)   # 8x8, lat [-60,60] lon [0,120]
DST_GRID = (-60.0, 24.0, 5, 0.0, 24.0, 5)   # 5x5, same domain


def _src_areas():
    import math

    lat0, dlat, nlat, lon0, dlon, nlon = SRC_GRID
    out = {}
    for i in range(nlat):
        a = math.sin(math.radians(lat0 + i * dlat))
        b = math.sin(math.radians(lat0 + (i + 1) * dlat))
        for j in range(nlon):
            out[i * nlon + j] = (b - a) * dlon
    return out


def _dst_areas():
    import math

    lat0, dlat, nlat, lon0, dlon, nlon = DST_GRID
    out = {}
    for I in range(nlat):
        a = math.sin(math.radians(lat0 + I * dlat))
        b = math.sin(math.radians(lat0 + (I + 1) * dlat))
        for J in range(nlon):
            out[I * nlon + J] = (b - a) * dlon
    return out


def test_conservative_2d_weights_partition_of_unity(spark):
    """Same-domain grids: per-dst weights sum to 1 (full coverage) and
    the gradient weights sum to 0 per src cell against dst areas —
    the algebraic identities behind mass conservation."""
    from ecmwf_models_spark.operators.remap import conservative_weights_2d

    w = conservative_weights_2d(spark, SRC_GRID, DST_GRID).toPandas()
    per_dst = w.groupby("dst_cell")["w"].sum()
    assert len(per_dst) == 25
    assert (per_dst - 1.0).abs().max() < 1e-12
    # sum_J A_dst * w2lat(i,J) == 0 per src cell (centroid identity)
    ad = _dst_areas()
    w["aw2lat"] = w.apply(lambda r: ad[int(r["dst_cell"])] * r["w2lat"], axis=1)
    w["aw2lon"] = w.apply(lambda r: ad[int(r["dst_cell"])] * r["w2lon"], axis=1)
    g = w.groupby("src_cell")[["aw2lat", "aw2lon"]].sum()
    assert g.abs().to_numpy().max() < 1e-10


def test_conservative_2d_mass_conservation(spark):
    """Area-weighted dst totals equal area-weighted src totals for both
    con (trivially) and con2 (gradient terms cancel per src cell), on an
    arbitrary deterministic field."""
    from ecmwf_models_spark.operators.remap import (
        cell_centroids_2d,
        conservative_weights_2d,
        remap_con2_2d,
        remap_weighted,
    )

    fact = spark.createDataFrame(
        [(c, float((c * 37 % 101) - 50) / 7.0) for c in range(64)],
        ["cell_id", "val"],
    )
    w = conservative_weights_2d(spark, SRC_GRID, DST_GRID)
    cen = cell_centroids_2d(spark, SRC_GRID)
    a_src, a_dst = _src_areas(), _dst_areas()
    mass_src = sum(
        a_src[c] * float((c * 37 % 101) - 50) / 7.0 for c in range(64)
    )

    con = remap_weighted(fact, w.select("src_cell", "dst_cell", "w"),
                         ("val",)).toPandas()
    m1 = sum(a_dst[int(r["dst_cell"])] * r["val_remap"]
             for _, r in con.iterrows())
    assert abs(m1 - mass_src) < 1e-9 * abs(mass_src)

    con2 = remap_con2_2d(fact, w, cen, "val", nlon=8).toPandas()
    m2 = sum(a_dst[int(r["dst_cell"])] * r["val_remap"]
             for _, r in con2.iterrows())
    assert abs(m2 - mass_src) < 1e-9 * abs(mass_src)


def test_conservative_2d_con2_exact_on_linear_field(spark):
    """A field linear in (lat, lon) — per-cell values at the cos-weighted
    centroids — remaps EXACTLY under con2_2d (dst value = linear at the
    dst cell's cos-weighted centroid), while first-order con has real
    error. The defining second-order property."""
    from ecmwf_models_spark.operators.remap import (
        _lat_centroid,
        cell_centroids_2d,
        conservative_weights_2d,
        remap_con2_2d,
        remap_weighted,
    )

    al, be, ga = 0.3, -0.11, 2.0

    def lin(clat, clon):
        return al * clat + be * clon + ga

    cen = cell_centroids_2d(spark, SRC_GRID).collect()
    fact = spark.createDataFrame(
        [(r["cell_id"], lin(r["clat"], r["clon"])) for r in cen],
        ["cell_id", "val"],
    )
    w = conservative_weights_2d(spark, SRC_GRID, DST_GRID)
    cen_df = cell_centroids_2d(spark, SRC_GRID)

    lat0, dlat, nlat, lon0, dlon, nlon = DST_GRID
    exact = {}
    for I in range(nlat):
        clat = _lat_centroid(lat0 + I * dlat, lat0 + (I + 1) * dlat)
        for J in range(nlon):
            exact[I * nlon + J] = lin(clat, lon0 + (J + 0.5) * dlon)

    con2 = remap_con2_2d(fact, w, cen_df, "val", nlon=8).toPandas()
    e2 = max(abs(r["val_remap"] - exact[int(r["dst_cell"])])
             for _, r in con2.iterrows())
    assert e2 < 1e-10, e2

    con = remap_weighted(fact, w.select("src_cell", "dst_cell", "w"),
                         ("val",)).toPandas()
    e1 = max(abs(r["val_remap"] - exact[int(r["dst_cell"])])
             for _, r in con.iterrows())
    assert e1 > 1e-3  # first-order really is first-order here


def test_con2d_oracle_rows_match_builder(spark):
    """The oracle's spark-free weight/centroid re-derivation
    (plans/entry_queries._con2d_weight_rows/_con2d_centroid_rows) is
    row-for-row IDENTICAL to the production builders — the twins cannot
    silently drift."""
    from ecmwf_models_spark.operators.remap import (
        cell_centroids_2d,
        conservative_weights_2d,
    )
    from ecmwf_models_spark.plans.entry_queries import (
        _DST_GRID_2D,
        _SRC_GRID_2D,
        _con2d_centroid_rows,
        _con2d_weight_rows,
    )

    built = sorted(
        tuple(r) for r in conservative_weights_2d(
            spark, _SRC_GRID_2D, _DST_GRID_2D
        ).collect()
    )
    rederived = sorted(_con2d_weight_rows())
    assert built == rederived  # bit-exact, not approx

    cen = sorted(
        tuple(r) for r in cell_centroids_2d(spark, _SRC_GRID_2D).collect()
    )
    assert cen == sorted(_con2d_centroid_rows())
