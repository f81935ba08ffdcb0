"""Regenerate the golden expected outputs under oracle/golden/.

These back the DuckDB oracles of the sf-INDEPENDENT synthetic keys
(`gen_images`, `img_decode_stats`, `pip_refine`, `media_*`): each key is
a pure function of seeded generators + fixed layers — no driver table
feeds it — so its exact output is a constant the driver can diff against
(`SELECT * FROM read_parquet('<repo>/oracle/golden/<key>.parquet')`).

Honesty note: a golden file is a REGRESSION PIN generated from the engine
itself, not an independent re-derivation.  The independent verification
of these paths lives in pytest (test_synth / test_codec / test_pip
compare the distributed kernels against standalone reference
implementations); the golden oracle then makes any drift driver-visible.

Usage: python tools/make_goldens.py [key ...]   (default: all golden keys)
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GOLDEN_KEYS = ("gen_images", "img_decode_stats", "pip_refine",
               "media_features", "media_resize", "media_frames",
               "img_augment", "simplify_rings", "poly_sample",
               # tile_raster is the one table-fed golden: it is pinned at
               # the driver's fixed correctness scale (sf0.01 per the
               # driver contract).  Its r2 trig-SQL twin recomputed the
               # Web-Mercator ln/tan in DuckDB, and a single last-ULP
               # libm disagreement (CPU-dispatched glibc vs local) moved
               # one point across a 1-of-2^30 pixel boundary -> hash
               # fail in the driver container while passing locally.
               "tile_raster",
               # tile_vector_encode: also table-fed and sf0.01-pinned —
               # the payload is LEB128 binary (hex in the key), which the
               # canonical text comparison can't re-derive in SQL; the
               # independent check is tests/test_vectile.py's decode
               # roundtrip vs the reference mercator kernel.
               "tile_vector_encode",
               # tile_vector_encode_mvt (late r4): same features, real
               # vector_tile.proto framing; independent check is the
               # mini-protobuf decode roundtrip pytest.
               "tile_vector_encode_mvt",
               # img_patches (late r4): all-integer patch stats + hex
               # rgb8 patch bytes; independent check = the exact tiling
               # identity pytest in tests/test_codec.py.
               "img_patches",
               # img_moments (late r4): all-integer raw/central moments;
               # independent check = brute double-loop kernel + exact
               # translation theorems in tests/test_moments.py.
               "img_moments",
               # bpe_tokenize (r4 cont.): table-fed, sf0.01-pinned —
               # iterative BPE merge training is not SQL-expressible;
               # independent check = tests/test_bpe.py's full
               # distributed-vs-pure-Python parity sweep.
               "bpe_tokenize",
               # img_histogram (r4 cont.): all-integer luminance bins;
               # independent check = brute per-pixel kernel in
               # tests/test_r4_cont.py.
               "img_histogram",
               # img_sobel (r4 cont.): all-integer Sobel gradient stats;
               # independent check = brute 3x3 kernel double-loop in
               # tests/test_sobel.py.
               "img_sobel",
               # img_palette (r4 cont.): all-integer fixed-cube palette
               # counts; independent check = brute per-pixel kernel in
               # tests/test_quantize.py.
               "img_palette",
               # bpe_train (r4 cont.): table-fed, sf0.01-pinned —
               # distributed whole-corpus BPE training; independent
               # check = the dist-vs-sequential parity sweep in
               # tests/test_bpe.py.
               "bpe_train",
               # img_cc_labels (r4 cont.): all-integer blob stats;
               # independent check = BFS flood-fill reference in
               # tests/test_cc.py.
               "img_cc_labels",
               # img_otsu (r4 cont.): big-int-rational argmax threshold;
               # independent check = Fraction-arithmetic brute in
               # tests/test_otsu.py.
               "img_otsu",
               # traj_frechet (r4 cont.): table-fed, sf0.01-pinned —
               # the discrete-Frechet DP is not SQL-expressible;
               # independent check = memoized recursive reference +
               # the f2 >= h2 domination theorem in tests/test_frechet.py.
               "traj_frechet",
               # traj_dtw (r5, post-window): table-fed, sf0.01-pinned —
               # the DTW min-of-sum DP is not SQL-expressible;
               # independent check = sequential rolling-row reference +
               # the dtw2 >= f2 domination theorem + endpoint lower
               # bound in tests/test_dtw.py.
               "traj_dtw",
               # img_percentiles (r5, post-window): exact discrete
               # order statistics of the luminance multiset;
               # independent check = brute sorted reference in
               # tests/test_r4_cont.py.
               "img_percentiles",
               # scan_mvt (r5, post-window): the decoded feature
               # relation of the sf0.01 z6 MVT tiles; independent
               # check = the payload-level encode->decode=id theorem
               # in tests/test_vectile.py.
               "scan_mvt",
               # img_rle (r4 cont.): all-integer run-length stats;
               # independent check = brute double-loop run scan in
               # tests/test_rle.py.
               "img_rle",
               # img_harris (r5): all-integer Harris corner response
               # stats (16x-scaled, 3x3 box structure tensor);
               # independent check = brute per-window double-loop +
               # transpose-invariance theorem in tests/test_harris.py.
               "img_harris",
               # traj_simplify (r5): table-fed, sf0.01-pinned — the
               # open-polyline DP recursion is not SQL-expressible;
               # independent check = reference-DP parity + property
               # suite in tests/test_traj_simplify.py.
               "traj_simplify",
               # img_template (r5): all-integer self-template SSD
               # match stats; independent check = brute double-loop +
               # planted-duplicate closed forms in tests/test_template.py.
               "img_template",
               # img_glcm (r5): all-integer co-occurrence texture
               # stats; independent check = brute dict-loop +
               # flat/checkerboard/transpose closed forms in
               # tests/test_glcm.py.
               "img_glcm",
               # img_lbp (r5): all-integer local-binary-pattern
               # histogram stats; independent check = brute
               # double-loop + flat/gradient closed forms in
               # tests/test_lbp.py.
               "img_lbp",
               # graph_msf (r5 cont.): sf-independent Borůvka minimum
               # spanning forest; independent check = sequential
               # Kruskal (sort + union-find) + forest laws in
               # tests/test_graph.py.
               "graph_msf",
               # img_median3 (r5 cont.): all-integer 3x3 median-filter
               # stats; independent check = brute 9-sort reference +
               # spike-erasure closed forms in tests/test_median3.py.
               "img_median3",
               # img_orient_hist (r5 cont.): all-integer octant
               # gradient histogram; independent check = atan2
               # reference + exhaustive boundary grid in
               # tests/test_orient.py.
               "img_orient_hist",
               # img_phash_rot (r5 cont.): orientation-orbit canonical
               # pHash; independent check = orbit invariance +
               # rot-commutes identity in tests/test_phash_rot.py.
               "img_phash_rot")


def main() -> None:
    import __spark_entry__ as entry_mod
    from engine.session import get_spark

    spark = get_spark("goldens", master="local[8]", shuffle_partitions=16,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(ROOT, "oracle", "golden")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    # synthetic keys ignore sf; tile_raster is PINNED at sf0.01 (the
    # driver's fixed correctness scale)
    sf = "/root/testdata/sf0.01"
    only = set(sys.argv[1:])
    keys = [k for k in GOLDEN_KEYS if not only or k in only]
    for key in keys:
        pdf = qs[key](spark, sf).toPandas()
        path = os.path.join(out_dir, f"{key}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"{key}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
