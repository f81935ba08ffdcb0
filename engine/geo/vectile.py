"""Vector-tile ENCODING: pack each slippy tile's features into one
compact binary payload — the operation an OSM-class tile pipeline runs
after the containment join and tile assignment to produce servable
tiles (Mapbox-Vector-Tile shape: tile-local quantized coordinates,
zigzag + delta + LEB128 varint streams; this is a simplified
self-contained codec, not the protobuf MVT format — the container has
no protobuf, and the geometry-stream mechanics are the part that
matters for the engine).

Payload layout (little-endian LEB128 varints throughout):

    varint(version=1) varint(extent) varint(n_features)
    then per feature, sorted by id ASC:
        varint(zigzag(id - prev_id))
        varint(zigzag(x - prev_x)) varint(zigzag(y - prev_y))

Determinism contract: coordinates quantize on the NATIVE level-30
mercator integer grid (the same xi/yi ints every tile/cell operator
uses — pure bit arithmetic below the tile prefix, no new trig), and
features sort by id inside the encoder, so the payload bytes are a pure
function of the feature set — independent of partitioning, shuffle
order, or host libm.  The driver key returns hex(payload) and pins a
golden (bytes can't ride the canonical value comparison; the
independent verification is the pytest decode-roundtrip against the
reference cell kernel).

Scale shape: tile + local coords are codegen bit ops; ONE tile-keyed
shuffle collects (id, x, y) structs per tile (objectHashAgg with
map-side partials); ONE batched Arrow scalar UDF encodes thousands of
tiles per Python call (the polygonize/rasterize batching lesson).
Payload size is bounded by the tile's feature count; hot tiles are the
same skew story as every tile-keyed op — and unlike joins, a vector
tile IS per-tile output, so the grid^2-style bound does not apply and
a 10^7-feature tile simply produces a long payload (real tile servers
cap features per tile upstream; `max_features` does that here,
deterministically keeping the lowest ids)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from engine.geo.cells import LEVEL, merc_xy_sql

EXTENT_BITS = 12          # 4096 x 4096 tile-local grid (MVT default)
EXTENT = 1 << EXTENT_BITS

# r4 (VERDICT r3 #4): the per-tile feature cap is ON by default.  One
# viral tile (a z6 tile over a megacity at 10^12 features) must not
# hold an unbounded collect_list buffer in a single aggregation task.
# With a cap, features are pre-filtered per tile through a row_number
# window (spillable sort — bounded memory at any tile size) BEFORE the
# collect, so the per-tile aggregation state is provably <= the cap.
# 65536 = 16x the MVT extent's side; real tile servers cap far lower.
# Deterministic contract: the LOWEST feature ids are kept.  Dropped
# coverage is observable via oversized_tile_stats (mirrors the LSH
# degenerate-bucket audit, engine/text/dedup.py::oversized_bucket_stats).
DEFAULT_MAX_FEATURES = 65536


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_payload(feats: list[tuple[int, int, int]], extent: int = EXTENT,
                   max_features: int | None = None) -> bytes:
    """One tile's payload from (id, x, y) triples (any order; sorted by
    id here so bytes are shuffle-independent)."""
    feats = sorted(feats)
    if max_features is not None:
        feats = feats[:max_features]
    out = bytearray(_varint(1) + _varint(extent) + _varint(len(feats)))
    pid = px = py = 0
    for fid, x, y in feats:
        out += _varint(_zigzag(fid - pid))
        out += _varint(_zigzag(x - px))
        out += _varint(_zigzag(y - py))
        pid, px, py = fid, x, y
    return bytes(out)


# ------------------------------------------------------ MVT framing (r4)
# Minimal Mapbox-Vector-Tile protobuf framing (VERDICT r3 #7): wraps the
# same id-sorted quantized point features in the REAL vector_tile.proto
# wire format — Tile{ Layer{ version=2, name, extent, Feature{ id,
# type=POINT, geometry=[MoveTo, zz(x), zz(y)] } } } — hand-rolled varint
# tags over the existing LEB128 codec (no protobuf lib in the sandbox;
# none needed: the spec is just tagged varints + length-delimited
# submessages).  A standard MVT parser accepts the payload structurally;
# pytest decodes it back with an independent mini protobuf reader.

_MVT_LAYER_NAME = b"features"


def _pb_key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_key(field, 2) + _varint(len(payload)) + payload


def encode_mvt_payload(feats: list[tuple[int, int, int]],
                       extent: int = EXTENT,
                       max_features: int | None = None) -> bytes:
    """One tile's features as a spec-conformant single-layer MVT tile:
    POINT features, one MoveTo command each, id-sorted (deterministic
    bytes under any input order, same contract as encode_payload)."""
    feats = sorted(feats)
    if max_features is not None:
        feats = feats[:max_features]
    body = bytearray()
    for fid, x, y in feats:
        geom = _varint(9) + _varint(_zigzag(x)) + _varint(_zigzag(y))
        feat = (_pb_key(1, 0) + _varint(fid)        # Feature.id
                + _pb_key(3, 0) + _varint(1)        # Feature.type = POINT
                + _pb_len(4, geom))                 # Feature.geometry
        body += _pb_len(2, feat)                    # Layer.features
    layer = (_pb_key(15, 0) + _varint(2)            # Layer.version = 2
             + _pb_len(1, _MVT_LAYER_NAME)          # Layer.name
             + _pb_key(5, 0) + _varint(extent)      # Layer.extent
             + bytes(body))
    return bytes(_pb_len(3, layer))                 # Tile.layers


def decode_mvt_payload(payload: bytes):
    """Independent mini protobuf reader for the roundtrip test ->
    (layer_name, extent, version, [(id, x, y), ...])."""
    def rd_varint(buf, pos):
        u = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u, pos
            shift += 7

    def fields(buf):
        pos = 0
        while pos < len(buf):
            key, pos = rd_varint(buf, pos)
            field, wire = key >> 3, key & 7
            if wire == 0:
                val, pos = rd_varint(buf, pos)
            elif wire == 2:
                n, pos = rd_varint(buf, pos)
                val = buf[pos:pos + n]
                pos += n
            else:
                raise ValueError(f"unexpected wire type {wire}")
            yield field, val

    layer = dict(fields(payload))[3]
    name = extent = version = None
    feats = []
    for f, v in fields(layer):
        if f == 1:
            name = bytes(v)
        elif f == 5:
            extent = v
        elif f == 15:
            version = v
        elif f == 2:
            fid = ftype = None
            geom = b""
            for ff, fv in fields(v):
                if ff == 1:
                    fid = fv
                elif ff == 3:
                    ftype = fv
                elif ff == 4:
                    geom = fv
            assert ftype == 1, ftype
            cmd, pos = rd_varint(geom, 0)
            assert cmd == 9, cmd  # MoveTo, count 1
            zx, pos = rd_varint(geom, pos)
            zy, pos = rd_varint(geom, pos)
            assert pos == len(geom)
            feats.append((fid, _unzigzag(zx), _unzigzag(zy)))
    return name, extent, version, feats


def decode_payload(payload: bytes):
    """Inverse of encode_payload -> (extent, [(id, x, y), ...])."""
    pos = 0

    def rd():
        nonlocal pos
        u = shift = 0
        while True:
            b = payload[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u
            shift += 7

    version = rd()
    assert version == 1, version
    extent = rd()
    n = rd()
    feats, pid, px, py = [], 0, 0, 0
    for _ in range(n):
        pid += _unzigzag(rd())
        px += _unzigzag(rd())
        py += _unzigzag(rd())
        feats.append((pid, px, py))
    assert pos == len(payload)
    return extent, feats


def encode_vector_tiles(df: DataFrame, z: int, id_col: str = "id",
                        lat: str = "lat", lon: str = "lon",
                        max_features: int | None = DEFAULT_MAX_FEATURES,
                        mvt: bool = False) -> DataFrame:
    """(tile_z, tile_x, tile_y, n_features, n_bytes, payload): every
    occupied z-tile's features packed into one payload.  Native bit-ops
    to tile + tile-local 4096-grid coords, one tile-keyed collect, one
    batched Arrow encode.

    With the (default) cap, features pass a per-tile row_number window
    first: the sort spills, so no task ever buffers more than
    `max_features` rows per tile in the collect — the encode stays safe
    under arbitrary hot-tile skew.  The window's hash exchange on
    (tile_x, tile_y) is reused by the groupBy, so the cap costs a sort
    within the SAME single shuffle, not a second one (and collect_list
    partials don't reduce shuffle volume anyway, so losing the map-side
    combine is free).  Pass max_features=None only when the input is
    known-bounded per tile."""
    assert z + EXTENT_BITS <= LEVEL
    xi, yi = merc_xy_sql(lon, lat)
    shift_t = LEVEL - z
    shift_l = LEVEL - z - EXTENT_BITS
    mask = EXTENT - 1
    pts = (df
           .withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
           .select(F.col(id_col).alias("fid"),
                   F.expr(f"_xi >> {shift_t}").alias("tile_x"),
                   F.expr(f"_yi >> {shift_t}").alias("tile_y"),
                   F.expr(f"(_xi >> {shift_l}) & {mask}").cast("int").alias("x"),
                   F.expr(f"(_yi >> {shift_l}) & {mask}").cast("int").alias("y")))
    if max_features is not None:
        w = Window.partitionBy("tile_x", "tile_y").orderBy("fid")
        pts = (pts.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= max_features).drop("_rn"))

    enc = encode_mvt_payload if mvt else encode_payload

    @F.pandas_udf(BinaryType())
    def encode(fxys: pd.Series) -> pd.Series:
        return pd.Series([
            enc([(int(it["fid"]), int(it["x"]), int(it["y"]))
                 for it in lst], max_features=max_features)
            for lst in fxys])

    packed = (pts.groupBy("tile_x", "tile_y")
              .agg(F.collect_list(F.struct("fid", "x", "y")).alias("fxy"),
                   F.count("*").cast("int").alias("n_features")))
    return (packed
            .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                    "n_features", encode(F.col("fxy")).alias("payload"))
            .withColumn("n_bytes", F.length("payload").cast("int")))


def oversized_tile_stats(df: DataFrame, z: int, id_col: str = "id",
                         lat: str = "lat", lon: str = "lon",
                         max_features: int = DEFAULT_MAX_FEATURES
                         ) -> DataFrame:
    """Observability for the feature cap: one row per z-tile whose RAW
    feature count exceeds `max_features`, with how many features the
    capped encode drops — surface this next to the tile output at scale
    so capped coverage is visible, never silent (the vector-tile twin
    of engine/text/dedup.py::oversized_bucket_stats)."""
    xi, yi = merc_xy_sql(lon, lat)
    s = LEVEL - z
    return (df.withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
            .groupBy(F.expr(f"_xi >> {s}").alias("tile_x"),
                     F.expr(f"_yi >> {s}").alias("tile_y"))
            .agg(F.count("*").alias("n_features_raw"))
            .filter(F.col("n_features_raw") > max_features)
            .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                    "n_features_raw",
                    (F.col("n_features_raw") - max_features)
                    .alias("n_dropped")))


def _with_tile_cols(df: DataFrame, z: int, lat: str, lon: str) -> DataFrame:
    xi, yi = merc_xy_sql(lon, lat)
    s = LEVEL - z
    return (df.withColumn("_xi", F.expr(xi)).withColumn("_yi", F.expr(yi))
            .withColumn("tile_x", F.expr(f"_xi >> {s}"))
            .withColumn("tile_y", F.expr(f"_yi >> {s}"))
            .drop("_xi", "_yi"))


def incremental_tiles(current: DataFrame, changed: DataFrame, z: int,
                      id_col: str = "id", lat: str = "lat",
                      lon: str = "lon",
                      broadcast_affected: bool = True) -> DataFrame:
    """Incremental tile maintenance — the north star's "OSM-style
    bounded spatial diffing" applied to the servable-tile layer: given
    the full CURRENT snapshot and the CHANGED rows (snapshot diff / CDC
    batch: inserts, updates, and deleted rows' old positions), re-encode
    ONLY the tiles a changed row touches.  Output one row per affected
    tile: action='recode' with the fresh payload, or action='drop' when
    no current row remains in the tile (payload NULL).  Untouched tiles
    are never read past the tile-key filter, never re-encoded, never
    emitted — at 10^12 features a bounded diff costs O(|diff| + rows in
    affected tiles), not a full re-tile.

    The affected tile set is O(|changed|) distinct keys and is
    broadcast by default (a bounded diff is the operator's contract,
    mirroring spatial_diff); pass broadcast_affected=False for an
    unbounded feed and let AQE pick the join strategy."""
    affected = (_with_tile_cols(changed, z, lat, lon)
                .select("tile_x", "tile_y").distinct())
    aff = F.broadcast(affected) if broadcast_affected else affected
    touched = (_with_tile_cols(current, z, lat, lon)
               .join(aff, ["tile_x", "tile_y"], "left_semi")
               .select(id_col, lat, lon))
    encoded = encode_vector_tiles(touched, z, id_col=id_col, lat=lat, lon=lon)
    # drop rows carry n_features=0 AND n_bytes=0 (r3 ADVICE: a uniform
    # integer contract for consumers reading the maintenance plan);
    # payload alone stays NULL — that IS the drop signal.
    return _finish_incremental(affected, encoded, z)


def _finish_incremental(affected: DataFrame, encoded: DataFrame,
                        z: int) -> DataFrame:
    return (affected.join(encoded, ["tile_x", "tile_y"], "left")
            .select(F.lit(z).cast("int").alias("tile_z"), "tile_x", "tile_y",
                    F.when(F.col("payload").isNull(), F.lit("drop"))
                    .otherwise(F.lit("recode")).alias("action"),
                    F.coalesce("n_features", F.lit(0)).alias("n_features"),
                    F.coalesce("n_bytes", F.lit(0)).alias("n_bytes"),
                    "payload"))


def incremental_tiles_partitioned(spark, layout_path: str,
                                  changed: DataFrame, z: int,
                                  z_layout: int = 3, id_col: str = "id",
                                  lat: str = "lat", lon: str = "lon"
                                  ) -> DataFrame:
    """incremental_tiles composed with the A8 tile-partitioned PHYSICAL
    layout (engine/geo/tiles.py::write_tile_partitioned) — this removes
    the one residual cost the plain operator pays at scale: a full-table
    tile-assign scan to find the affected tiles' current rows
    (BASELINE.md late-r3 spot run: the 5.7 s incremental floor).

    The current snapshot lives tile-partitioned at z_layout (coarser
    than the encode zoom z); the affected z-tile set derives its coarse
    layout-tile set by a shift (each layout tile covers
    4^(z - z_layout) encode tiles).  That coarse set is collected —
    bounded by the operator's bounded-diff contract, O(|diff|) distinct
    tiles and usually far fewer — and applied as per-axis IN-list
    predicates on the PARTITION COLUMNS, which resolve to STATIC
    PartitionFilters directory pruning: untouched tile_x=<x>/tile_y=<y>
    directories are never even listed (plan-asserted in
    tests/test_vectile.py).  The per-axis form prunes to the bounding
    cross product (exact row membership is still enforced by the fine
    z-tile semi-join below), which is tight for the localized diffs CDC
    batches produce.  (A join-based DPP form was measured NOT to prune
    here: Spark's dynamic partition pruning declines sides without a
    selective predicate, so the explicit literal filter is the reliable
    plan.)  Cost is O(|diff| + rows in pruned-in layout partitions) —
    no term scales with the table."""
    shift = z - z_layout
    assert shift >= 0, (z, z_layout)
    affected = (_with_tile_cols(changed, z, lat, lon)
                .select("tile_x", "tile_y").distinct()
                .localCheckpoint(eager=True))
    coarse = (affected
              .select(F.expr(f"tile_x >> {shift}").alias("px"),
                      F.expr(f"tile_y >> {shift}").alias("py"))
              .distinct().collect())
    xs = sorted({r.px for r in coarse})
    ys = sorted({r.py for r in coarse})
    layout = spark.read.parquet(layout_path)
    pruned = (layout
              .filter(F.col("tile_x").isin(xs) & F.col("tile_y").isin(ys))
              .select(id_col, lat, lon))
    touched = (_with_tile_cols(pruned, z, lat, lon)
               .join(F.broadcast(affected), ["tile_x", "tile_y"],
                     "left_semi")
               .select(id_col, lat, lon))
    encoded = encode_vector_tiles(touched, z, id_col=id_col, lat=lat,
                                  lon=lon)
    return _finish_incremental(affected, encoded, z)


def read_mvt_tiles(tiles: DataFrame) -> DataFrame:
    """Distributed MVT tile SOURCE (A17, r5 post-window) — the decode
    half that makes the vector-tile surface an interchange, not just a
    sink: (tile_z, tile_x, tile_y, payload binary) -> one row per
    feature (tile_z, tile_x, tile_y, layer, extent, version, fid, px,
    py), via the independent mini-protobuf reader
    (decode_mvt_payload — tagged-varint walking, no protobuf lib).

    Composed with encode_vector_tiles(mvt=True) this is the
    encode -> decode = id theorem as a DRIVER surface: the decoded
    relation must byte-for-byte reproduce the quantized feature sets
    that went in (tests/test_vectile.py proves the payload level; the
    driver key proves the distributed path).

    Scale shape: ONE Arrow-batched mapInPandas pass over the tile
    frame — payload bytes never ride a shuffle; fan-out is bounded by
    the encoder's max_features cap per tile."""
    import pandas as pd

    def _dec(batches):
        for pdf in batches:
            out = {k: [] for k in ("tile_z", "tile_x", "tile_y",
                                   "layer", "extent", "version",
                                   "fid", "px", "py")}
            for r in pdf.itertuples(index=False):
                name, extent, version, feats = \
                    decode_mvt_payload(bytes(r.payload))
                for fid, x, y in feats:
                    out["tile_z"].append(int(r.tile_z))
                    out["tile_x"].append(int(r.tile_x))
                    out["tile_y"].append(int(r.tile_y))
                    out["layer"].append(name.decode("ascii"))
                    out["extent"].append(int(extent))
                    out["version"].append(int(version))
                    out["fid"].append(int(fid))
                    out["px"].append(int(x))
                    out["py"].append(int(y))
            yield pd.DataFrame(out)

    schema = ("tile_z int, tile_x long, tile_y long, layer string, "
              "extent long, version long, fid long, px long, py long")
    return tiles.select("tile_z", "tile_x", "tile_y", "payload") \
        .mapInPandas(_dec, schema=schema)
