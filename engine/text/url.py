"""URL canonicalization (SURVEY.md §2.M41, r5 post-window) — the
crawl-dedup preprocessing step: two spellings of the same resource
must map to one canonical string BEFORE exact/fuzzy dedup sees them,
or the dedup family undercounts.

Canonicalization CONTRACT (each rule is part of the operator's
definition — canonicalizers differ across crawlers, so the rule set
being pinned is what makes results reproducible):

  1. scheme lowercased;
  2. host lowercased, one leading "www." stripped;
  3. default ports dropped (http:80, https:443), others kept;
  4. path kept case-SENSITIVE (RFC 3986: only scheme+host are
     case-insensitive), trailing "/" stripped (root becomes empty);
  5. fragment dropped;
  6. query parameters split on "&", empties dropped, SORTED
     lexicographically, rejoined (param ORDER is transport noise,
     duplicates kept — repeated keys are semantically meaningful).

All-native: regexp_extract part decomposition + array sort/join HOFs;
zero shuffle, zero Python.  The DuckDB twin re-implements the same
rules in its own dialect — an independent formulation, not shared
text."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_urls(df: DataFrame, *, id_col: str = "doc_id",
                      url_col: str = "url") -> DataFrame:
    """-> (id, url, canon_url, host, port, n_params)."""
    u = url_col
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    host0 = f"lower(regexp_extract({hostport}, '^([^:]*)', 1))"
    host = (f"CASE WHEN {host0} LIKE 'www.%' "
            f"THEN substring({host0}, 5) ELSE {host0} END")
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    keep_port = (f"CASE WHEN {port} = '' THEN '' "
                 f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
                 f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
                 f"ELSE ':' || {port} END")
    path0 = f"regexp_extract({rest}, '^[^/?#]*(/[^?#]*)', 1)"
    path = f"regexp_replace({path0}, '/+$', '')"
    query = f"regexp_extract({u}, '\\\\?([^#]*)', 1)"
    params = (f"array_sort(filter(split({query}, '&'), p -> p <> ''))")
    qcanon = (f"CASE WHEN size({params}) = 0 THEN '' "
              f"ELSE '?' || array_join({params}, '&') END")
    canon = (f"{scheme} || '://' || {host} || {keep_port} "
             f"|| {path} || {qcanon}")
    return df.select(
        F.col(id_col), F.col(u).alias("url"),
        F.expr(canon).alias("canon_url"),
        F.expr(host).alias("host"),
        F.expr(f"CASE WHEN {keep_port} = '' THEN '' ELSE {port} END")
        .alias("port"),
        F.expr(f"CAST(size({params}) AS INT)").alias("n_params"))
