"""pyspark-geotile-engine — a PySpark-native spatial-join + tiling engine.

Built from scratch on the public DataFrame / Arrow pandas-UDF API per the
capability contract in /root/repo/BASELINE.json (north_star line 6,
north_rule line 14, input_hint line 15) and the blueprint in
/root/repo/SURVEY.md.  The reference tree (/root/reference) is empty
(SURVEY.md §0), so no reference file citations exist; each module cites
the BASELINE.json / SURVEY.md requirement it implements instead.
"""

__version__ = "0.1.0"
