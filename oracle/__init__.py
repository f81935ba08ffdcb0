"""Pure-Python sequential oracle (SURVEY.md §5.1).

Frozen semantic ground truth for the engine's spatial / image operators.
Every vectorized engine operator must match these implementations exactly
(join rows, tile ids, cell ids — BASELINE.json:6,14) or within the stated
pixel invariant (PSNR >= 40 dB for lossy codecs, BASELINE.json:15).
Numpy-free where practical; no Spark imports allowed here.
"""
