"""Portability lint: the engine must not touch the RDD API (SURVEY §1.3
"no RDD API anywhere").  `.rdd` round-trips break under Spark Connect —
the same constraint SURVEY §4 cites for cluster portability — and every
former use (emptiness probes in iterative operators) has a DataFrame
form (`df.isEmpty()`).  VERDICT r4 "What's wrong" #2 / next-round #4.

Pure source scan, no Spark session needed.
"""
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent

# Everything that ships: engine package, driver entry, jobs, oracle
# helpers, tools, bench.  Tests are scanned too — an .rdd in a test
# normalizes the pattern for the next reader.
SCAN_DIRS = ["engine", "jobs", "oracle", "tools", "tests"]
SCAN_FILES = ["__spark_entry__.py", "bench.py"]

_RDD_USE = re.compile(r"\.rdd\b|\bsparkContext\.parallelize\b|\bRDD\b")


def _py_sources():
    for d in SCAN_DIRS:
        root = REPO / d
        if root.exists():
            yield from sorted(root.rglob("*.py"))
    for f in SCAN_FILES:
        p = REPO / f
        if p.exists():
            yield p


def test_engine_is_rdd_free():
    offenders = []
    for path in _py_sources():
        if path.name == "test_no_rdd_api.py":
            continue
        for lineno, line in enumerate(
                path.read_text(encoding="utf-8").splitlines(), start=1):
            code = line.split("#", 1)[0]
            if _RDD_USE.search(code):
                offenders.append(f"{path.relative_to(REPO)}:{lineno}: "
                                 f"{line.strip()}")
    assert not offenders, (
        "RDD API use found (use DataFrame.isEmpty()/limit(1) probes, "
        "spark.range/createDataFrame sources):\n" + "\n".join(offenders))
