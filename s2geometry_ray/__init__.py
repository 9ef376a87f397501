"""s2geometry_ray — a Ray-Data-native spatial-join + tiling engine.

Re-implements the query/data-processing capabilities of the reference
S2 geometry library (alex-alex/S2Geometry, a Swift port of Google's S2
library — see SURVEY.md; /root/reference is empty in this sandbox, so
semantics are pinned to the documented, cross-port-identical S2 family
behavior reproduced inline in SURVEY.md §3) as a from-scratch engine:

- ``kernels/``   vectorized numpy-over-Arrow S2 math (cell ids, regions,
                 coverings) + pure-python image codecs and phash
- ``oracle/``    slow scalar pure-python truth implementations used by
                 the pytest oracle (dual-implementation cross-check)
- ``stages/``    Ray Data ``map_batches`` / actor-pool pipeline stages
- ``sources/``   deterministic synthetic generators + IO helpers
- ``pipelines/`` end-to-end jobs (flagship spatial join, TPC-H-ish)
- ``state/``     per-partition manifests for checkpoint/resume
- ``functions/`` training-data ops: dedup, text analysis, ANN

Nothing here calls ``ray.init()``; the process that owns the Ray
session (bench.py, tests/conftest.py, CLI) initialises it.
"""

MAX_LEVEL = 30
